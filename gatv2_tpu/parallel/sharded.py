"""Sharded full-graph training: shard_map over a ('graph', 'head') mesh.

Design (SURVEY.md §2.5 — the reference has no distributed path at all, this
is new capability):

  graph axis — edge/sequence-parallel analog:
  - node features / labels / edge arrays are sharded on axis 0 over the
    'graph' axis (see parallel/partition.py for the layout);
  - per layer, each device computes its nodes' projections zs/zd locally
    (dense MXU matmuls on [N/S, F] blocks), then `all_gather`s the src-side
    projections over ICI — the halo exchange. Attention scores, segment
    softmax, and aggregation all stay LOCAL because every edge lives on its
    destination's shard;
  - loss/accuracy are local sums + one psum, normalized by the REAL node
    count (padding nodes carry label -1 and are masked).

  head axis — tensor parallelism (heads are embarrassingly parallel; the
  reference's layouts are head-major for the same reason, e.g. attn_score
  [H, E], GATv2_edge_based.cu:297):
  - each layer's W_src/W_dst/a are sharded on their leading head dim when
    the layer's head count divides the axis size, else replicated (and the
    layer computed redundantly — e.g. the 1-head last layer);
  - hidden layers all_gather the per-head outputs over 'head' to form the
    concat [n_loc, H*D] every shard needs for the next projection;
  - the last layer's head average is a psum over 'head'.

Model parameters not sharded on 'head' are REPLICATED; their gradients are
psum'd by the autodiff transpose of the replicated capture (shard_map
handles this). Differentiation happens OUTSIDE shard_map (jax.value_and_grad
of a function whose body is shard_map'ped), so XLA transposes the
all_gathers into reduce_scatters in the backward pass automatically.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gatv2_tpu.config import ModelConfig, TrainConfig
from gatv2_tpu.ops.segment import (
    EXP_CLAMP,
    SOFTMAX_EPS,
    segment_max,
    segment_softmax,
    segment_sum,
)
from gatv2_tpu.parallel.partition import PartitionedGraph
from gatv2_tpu.train import optim


def _head_axis_size(mesh: Mesh, head_axis: str | None) -> int:
    if head_axis is None or head_axis not in mesh.axis_names:
        return 1
    return mesh.shape[head_axis]


def _layer_head_sharded(num_heads: int, head_size: int) -> bool:
    return head_size > 1 and num_heads % head_size == 0


def _halo_all_to_all(zs_loc, send_ids_me, axis_name):
    """Boundary-only halo exchange: gather the rows each peer references
    and route them with one all_to_all (autodiff transposes it back)."""
    s_count, m = send_ids_me.shape
    send = jnp.take(zs_loc, send_ids_me.reshape(-1), axis=0, mode="clip").reshape(
        s_count, m, *zs_loc.shape[1:]
    )
    return jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0
    ).reshape(s_count * m, *zs_loc.shape[1:])



def param_specs(
    model_config: ModelConfig, mesh: Mesh, *, head_axis: str | None = "head"
):
    """PartitionSpec pytree for GATv2Params: head-TP where divisible."""
    hs = _head_axis_size(mesh, head_axis)
    layers = []
    for h in model_config.heads:
        if _layer_head_sharded(h, hs):
            layers.append(
                {
                    "w_src": P(head_axis, None, None),
                    "w_dst": P(head_axis, None, None),
                    "a": P(head_axis, None),
                }
            )
        else:
            layers.append({"w_src": P(), "w_dst": P(), "a": P()})
    return {"layers": tuple(layers), "w_o": P()}


def _sharded_layer(
    layer_params,
    x_loc: jax.Array,  # [n_loc, F] this shard's node features
    src_g: jax.Array,  # [e_loc] global src ids for this shard's edges
    dst_l: jax.Array,  # [e_loc] local dst ids (n_loc = padding)
    *,
    axis_name: str,
    head_axis: str | None,
    head_sharded: bool,
    num_heads_global: int,
    is_last: bool,
    negative_slope: float,
    variant: str,
    precision=None,
    impl: str = "xla",
    edge_tiles=None,
    interpret: bool = False,
    halo=None,  # (send_ids_me [S, M], src_slot_ids [e_loc]) for
    #             boundary-only exchange; None -> full all_gather
    overlap=None,  # (local_src, local_dst, halo_src, halo_dst) this-shard
    #             rows of an OverlapSplit -> two-pass stat-merged attention
    overlap_tiles=None,  # (local_tiles, halo_tiles) EdgeTiles pair ->
    #             Pallas two-pass merged-softmax kernels (partition.
    #             prepare_overlap_tiles); requires halo
    streams: str = "f32",  # SELL edge-stream dtype tier (non-overlap path)
) -> jax.Array:
    w_src, w_dst, a = layer_params["w_src"], layer_params["w_dst"], layer_params["a"]
    n_loc = x_loc.shape[0]
    # local (head-shard's) projections — dense MXU matmuls
    zs_loc = jnp.einsum("nf,hdf->nhd", x_loc, w_src, precision=precision)
    zd_loc = jnp.einsum("nf,hdf->nhd", x_loc, w_dst, precision=precision)

    if overlap_tiles is not None and halo is not None and impl == "sell":
        # SELL halo/compute overlap: same structure as the Pallas merge —
        # the all_to_all is issued first, the LOCAL pass's kernels have no
        # data dependence on it, and the per-destination softmax stats
        # merge exactly inside sell_attention_merge's custom VJP.
        from gatv2_tpu.ops.attention import precision_name
        from gatv2_tpu.ops.sell_attention import sell_attention_merge

        halo_rows = _halo_all_to_all(zs_loc, halo[0], axis_name)
        h = sell_attention_merge(
            (zs_loc, halo_rows), zd_loc, a, n_loc,
            negative_slope=negative_slope, sell_tiles_parts=overlap_tiles,
            interpret=interpret, precision=precision_name(precision),
        )  # [n_loc, H_loc, D]
        return _combine_heads(
            h, n_loc,
            is_last=is_last, negative_slope=negative_slope, variant=variant,
            head_sharded=head_sharded, head_axis=head_axis,
            num_heads_global=num_heads_global,
        )

    if overlap_tiles is not None and halo is not None and impl == "pallas":
        # Pallas halo/compute overlap: the boundary all_to_all is issued
        # first; the LOCAL pass's fused kernel has no data dependence on it
        # and can run underneath; the HALO pass consumes the exchanged rows;
        # the per-destination online-softmax stats merge exactly inside
        # edge_attention_pallas_merge (custom VJP spans both passes).
        from gatv2_tpu.ops.attention import precision_name
        from gatv2_tpu.ops.pallas_attention import edge_attention_pallas_merge

        halo_rows = _halo_all_to_all(zs_loc, halo[0], axis_name)
        prec_name = precision_name(precision)
        h = edge_attention_pallas_merge(
            (zs_loc, halo_rows), zd_loc, a, n_loc,
            negative_slope=negative_slope, edge_tiles_parts=overlap_tiles,
            interpret=interpret, precision=prec_name,
        )  # [n_loc, H_loc, D]
        return _combine_heads(
            h, n_loc,
            is_last=is_last, negative_slope=negative_slope, variant=variant,
            head_sharded=head_sharded, head_axis=head_axis,
            num_heads_global=num_heads_global,
        )

    if overlap is not None and halo is not None and impl != "pallas":
        # halo/compute-overlap structure (the graph analog of ring
        # attention's online-softmax merge): issue the boundary all_to_all,
        # then run the LOCAL-src edge pass — its SDDMM/gather work has no
        # data dependence on the exchange, so XLA's async collectives can
        # overlap it with the transfer; the halo-src pass consumes the
        # exchanged rows; per-destination softmax stats from the two passes
        # merge exactly (same max-shift and eps as segment_softmax).
        halo_rows = _halo_all_to_all(zs_loc, halo[0], axis_name)

        l_src, l_dst, h_src, h_dst = overlap

        def edge_scores(space, src_idx, dst_idx):
            zs_e = jnp.take(space, src_idx, axis=0, mode="clip")
            zd_e = jnp.take(zd_loc, jnp.minimum(dst_idx, n_loc - 1), axis=0, mode="clip")
            s = jax.nn.leaky_relu(zs_e + zd_e, negative_slope)
            e = jnp.einsum("ehd,hd->eh", s, a, precision=precision)
            return e, zs_e

        e1, zs1 = edge_scores(zs_loc, l_src, l_dst)  # halo-independent
        e2, zs2 = edge_scores(halo_rows, h_src, h_dst)
        m1 = segment_max(e1, l_dst, n_loc)
        m2 = segment_max(e2, h_dst, n_loc)
        m_all = jnp.maximum(m1, m2)
        m_all = jnp.where(jnp.isfinite(m_all), m_all, 0.0)

        def pass_sums(e_k, zs_k, dst_k):
            shifted = e_k - jnp.take(m_all, jnp.minimum(dst_k, n_loc - 1), axis=0, mode="clip")
            w = jnp.exp(jnp.maximum(shifted, EXP_CLAMP))
            u = segment_sum(w[:, :, None] * zs_k, dst_k, n_loc)
            l = segment_sum(w, dst_k, n_loc)
            return u, l

        u1, l1 = pass_sums(e1, zs1, l_dst)
        u2, l2 = pass_sums(e2, zs2, h_dst)
        h = (u1 + u2) / (l1 + l2 + SOFTMAX_EPS)[:, :, None]
        return _combine_heads(
            h, n_loc,
            is_last=is_last, negative_slope=negative_slope, variant=variant,
            head_sharded=head_sharded, head_axis=head_axis,
            num_heads_global=num_heads_global,
        )

    if halo is None:
        # halo exchange, dense form: src projections of ALL nodes
        zs_space = jax.lax.all_gather(zs_loc, axis_name, axis=0, tiled=True)
        src_idx = src_g
    else:
        # boundary-only exchange: each shard sends exactly the rows its
        # peers reference (HaloPlan); one all_to_all per layer, volume
        # O(edge cut) instead of O(N). Autodiff transposes it back.
        send_ids_me, src_idx = halo
        halo_rows = _halo_all_to_all(zs_loc, send_ids_me, axis_name)
        # gather space = [own rows | exchanged rows]: the diagonal block is
        # never exchanged (HaloPlan), local srcs index zs_loc directly
        zs_space = jnp.concatenate([zs_loc, halo_rows], axis=0)

    if impl in ("pallas", "sell"):
        # fused bipartite kernels: src space = exchanged rows, dst = local
        from gatv2_tpu.ops.attention import edge_attention

        h = edge_attention(
            zs_space, zd_loc, a, None, None, n_loc,
            negative_slope=negative_slope, impl=impl,
            edge_tiles=edge_tiles, precision=precision, interpret=interpret,
            streams=streams,
        )  # [n_loc, H_loc, D]
    else:
        zs_e = jnp.take(zs_space, src_idx, axis=0, mode="clip")  # [e_loc, H_loc, D]
        zd_e = jnp.take(zd_loc, jnp.minimum(dst_l, n_loc - 1), axis=0, mode="clip")
        s = jax.nn.leaky_relu(zs_e + zd_e, negative_slope)
        e = jnp.einsum("ehd,hd->eh", s, a, precision=precision)
        alpha = segment_softmax(e, dst_l, n_loc)
        h = segment_sum(alpha[:, :, None] * zs_e, dst_l, n_loc)

    return _combine_heads(
        h, n_loc,
        is_last=is_last, negative_slope=negative_slope, variant=variant,
        head_sharded=head_sharded, head_axis=head_axis,
        num_heads_global=num_heads_global,
    )


def _combine_heads(
    h, n_loc, *, is_last, negative_slope, variant, head_sharded, head_axis,
    num_heads_global,
):
    """Per-layer head combine: hidden concat / last-layer average, with the
    variant's activation order (models/gatv2.py) and head-TP collectives."""
    if not is_last:
        h = jax.nn.leaky_relu(h, negative_slope)
        if head_sharded:
            # concat across head shards: [n_loc, H_loc, D] -> [n_loc, H, D]
            h = jax.lax.all_gather(h, head_axis, axis=1, tiled=True)
        return h.reshape(n_loc, -1)
    if variant == "edge":
        h = jax.nn.leaky_relu(h, negative_slope)
        hsum = jnp.sum(h, axis=1)
        if head_sharded:
            hsum = jax.lax.psum(hsum, head_axis)
        return hsum / num_heads_global
    hsum = jnp.sum(h, axis=1)
    if head_sharded:
        hsum = jax.lax.psum(hsum, head_axis)
    return jax.nn.leaky_relu(hsum / num_heads_global, negative_slope)


def make_sharded_loss_fn(
    model_config: ModelConfig,
    mesh: Mesh,
    num_real_nodes: int,
    *,
    axis_name: str = "graph",
    head_axis: str | None = "head",
    impl: str = "xla",
    edge_tiles=None,  # stacked per-shard tiles (prepare_partitioned_tiles)
    interpret: bool = False,
    halo_plan=None,  # partition.HaloPlan -> boundary-only exchange
    overlap_split=None,  # partition.OverlapSplit -> two-pass stat-merged
    #   attention structured for halo/compute overlap (xla impl + halo only)
    overlap_tiles=None,  # (local, halo) stacked EdgeTiles pair -> Pallas
    #   two-pass merged-softmax layer (partition.prepare_overlap_tiles)
) -> Callable:
    """Returns loss_fn(params, features, src, dst_local, labels) -> (loss, acc)
    where the data arguments are globally-shaped arrays sharded on axis 0
    of the 'graph' mesh axis; params follow param_specs (head-TP).
    impl='pallas' runs the fused bipartite kernels per shard (edge_tiles
    from parallel.partition.prepare_partitioned_tiles)."""
    hs = _head_axis_size(mesh, head_axis)
    has_head_axis = head_axis is not None and head_axis in mesh.axis_names
    if impl in ("pallas", "sell") and edge_tiles is None and (
        overlap_tiles is None
    ):
        raise ValueError(
            f"impl={impl!r} needs edge_tiles (stacked per shard: "
            "prepare_partitioned_tiles / prepare_partitioned_sell_tiles) "
            "or overlap_tiles"
        )
    if overlap_tiles is not None and halo_plan is None:
        raise ValueError("overlap_tiles needs halo_plan (boundary exchange)")
    halo_arrays = None
    if halo_plan is not None:
        halo_arrays = (
            jnp.asarray(halo_plan.send_ids),  # [S, S, M]
            jnp.asarray(halo_plan.src_halo),  # [S, E_s]
        )
    overlap_arrays = None
    if overlap_split is not None:
        if halo_plan is None or impl != "xla":
            raise ValueError(
                "overlap_split needs halo_plan and the xla impl (the fused "
                "Pallas/SELL kernels do their own softmax internally)"
            )
        overlap_arrays = tuple(
            jnp.asarray(a)
            for a in (
                overlap_split.local_src, overlap_split.local_dst,
                overlap_split.halo_src, overlap_split.halo_dst,
            )
        )

    def logits_body(params, x_loc, src_g, dst_l, et_sh, halo_sh, ov_sh,
                    ovt_sh):
        et_loc = (
            jax.tree.map(lambda x: x[0], et_sh) if et_sh is not None else None
        )
        halo_loc = (
            (halo_sh[0][0], halo_sh[1][0]) if halo_sh is not None else None
        )
        ov_loc = (
            tuple(a[0] for a in ov_sh) if ov_sh is not None else None
        )
        ovt_loc = (
            jax.tree.map(lambda x: x[0], ovt_sh)
            if ovt_sh is not None
            else None
        )
        x = x_loc
        for l, layer_params in enumerate(params["layers"]):
            def run_layer(layer_params, x, l=l):
                return _sharded_layer(
                    layer_params,
                    x,
                    src_g,
                    dst_l,
                    axis_name=axis_name,
                    head_axis=head_axis if has_head_axis else None,
                    head_sharded=_layer_head_sharded(
                        model_config.heads[l], hs
                    ),
                    num_heads_global=model_config.heads[l],
                    is_last=(l == model_config.num_layers - 1),
                    negative_slope=model_config.negative_slope,
                    variant=model_config.variant,
                    precision=model_config.precision,
                    impl=impl,
                    edge_tiles=et_loc,
                    interpret=interpret,
                    halo=halo_loc,
                    overlap=ov_loc,
                    overlap_tiles=ovt_loc,
                    streams=model_config.streams,
                )

            if model_config.remat:
                # collectives and pallas calls replay fine under checkpoint;
                # the single-device forward honors the same flag
                # (models/gatv2.py)
                run_layer = jax.checkpoint(run_layer)
            x = run_layer(layer_params, x)
        return jnp.matmul(x, params["w_o"].T, precision=model_config.precision)

    def body(params, x_loc, src_g, dst_l, labels_loc, et_sh, halo_sh, ov_sh,
             ovt_sh):
        logits = logits_body(
            params, x_loc, src_g, dst_l, et_sh, halo_sh, ov_sh, ovt_sh
        )
        # local masked sums, then one psum (padding nodes have label -1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        valid = labels_loc >= 0
        safe = jnp.where(valid, labels_loc, 0)
        nll = -jnp.take_along_axis(logp, safe[:, None].astype(jnp.int32), axis=1)[:, 0]
        correct = jnp.argmax(logits, axis=-1).astype(jnp.int32) == safe
        loss_sum = jnp.sum(jnp.where(valid, nll, 0.0))
        correct_sum = jnp.sum(jnp.where(valid, correct, False).astype(jnp.float32))
        loss = jax.lax.psum(loss_sum, axis_name) / num_real_nodes
        acc = jax.lax.psum(correct_sum, axis_name) / num_real_nodes
        return loss, acc

    pspecs = (
        param_specs(model_config, mesh, head_axis=head_axis)
        if has_head_axis
        else jax.tree.map(lambda _: P(), param_specs(model_config, mesh, head_axis=None))
    )
    et_specs = (
        jax.tree.map(
            lambda x: P(axis_name, *([None] * (x.ndim - 1))), edge_tiles
        )
        if edge_tiles is not None
        else None
    )
    halo_specs = (
        (P(axis_name, None, None), P(axis_name, None))
        if halo_arrays is not None
        else None
    )
    overlap_specs = (
        tuple(P(axis_name, None) for _ in range(4))
        if overlap_arrays is not None
        else None
    )
    ovt_specs = (
        jax.tree.map(
            lambda x: P(axis_name, *([None] * (x.ndim - 1))), overlap_tiles
        )
        if overlap_tiles is not None
        else None
    )
    data_specs = (
        P(axis_name, None),  # features
        P(axis_name),  # src
        P(axis_name),  # dst_local
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        # pallas_call outputs carry no varying-mesh-axes metadata yet
        check_vma=False,
        in_specs=(
            pspecs,  # params: head-TP sharded / replicated
            *data_specs,
            P(axis_name),  # labels
            et_specs,  # stacked per-shard edge tiles (or None)
            halo_specs,  # boundary-exchange plan arrays (or None)
            overlap_specs,  # overlap edge split (or None)
            ovt_specs,  # overlap tile pair (or None)
        ),
        out_specs=(P(), P()),
    )
    # logits variant (sharded [n_pad, C] output) — the split-eval building
    # block; built from the same body so eval shares the training forward
    mapped_logits = jax.shard_map(
        logits_body,
        mesh=mesh,
        check_vma=False,
        in_specs=(pspecs, *data_specs, et_specs, halo_specs, overlap_specs,
                  ovt_specs),
        out_specs=P(axis_name, None),
    )
    fn = lambda params, feats, src, dst_l, labels: mapped(
        params, feats, src, dst_l, labels, edge_tiles, halo_arrays,
        overlap_arrays, overlap_tiles,
    )
    fn.logits_fn = lambda params, feats, src, dst_l: mapped_logits(
        params, feats, src, dst_l, edge_tiles, halo_arrays, overlap_arrays,
        overlap_tiles,
    )
    return fn


def make_sharded_train_step(
    model_config: ModelConfig,
    train_config: TrainConfig,
    mesh: Mesh,
    num_real_nodes: int,
    *,
    axis_name: str = "graph",
    head_axis: str | None = "head",
    donate: bool = True,
    edge_tiles=None,
    interpret: bool = False,
    halo_plan=None,
    overlap_split=None,
    overlap_tiles=None,
) -> Callable:
    """jit(step)(params, opt_state, t, features, src, dst_local, labels)
    -> (params, opt_state, loss, acc), with data sharded over the mesh."""
    loss_fn = make_sharded_loss_fn(
        model_config, mesh, num_real_nodes, axis_name=axis_name,
        head_axis=head_axis, impl=train_config.impl, edge_tiles=edge_tiles,
        interpret=interpret, halo_plan=halo_plan, overlap_split=overlap_split,
        overlap_tiles=overlap_tiles,
    )

    def step(params, opt_state, t, features, src, dst_l, labels):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: loss_fn(p, features, src, dst_l, labels), has_aux=True
        )(params)
        params, opt_state = optim.apply_updates(
            params, grads, opt_state, t, train_config
        )
        return params, opt_state, loss, acc

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_sharded_multi_epoch_runner(
    model_config: ModelConfig,
    train_config: TrainConfig,
    mesh: Mesh,
    num_real_nodes: int,
    num_epochs: int,
    *,
    axis_name: str = "graph",
    head_axis: str | None = "head",
    edge_tiles=None,
    interpret: bool = False,
    halo_plan=None,
    overlap_split=None,
    overlap_tiles=None,
) -> Callable:
    """K sharded epochs as ONE device program via lax.scan — the sharded
    analog of train.loop.make_multi_epoch_runner, for the scaling bench
    (bench.py --mesh N): no host round-trip per epoch, so the differenced
    two-program timing isolates per-epoch device time including the halo
    collectives.

    Returns jit(run)(params, opt_state, t0, features, src, dst_l, labels)
    -> (params, opt_state, losses[K], accs[K]).
    """
    loss_fn = make_sharded_loss_fn(
        model_config, mesh, num_real_nodes, axis_name=axis_name,
        head_axis=head_axis, impl=train_config.impl, edge_tiles=edge_tiles,
        interpret=interpret, halo_plan=halo_plan, overlap_split=overlap_split,
        overlap_tiles=overlap_tiles,
    )

    def runner(params, opt_state, t0, features, src, dst_l, labels):
        def body(carry, t):
            params, opt_state = carry
            (loss, acc), grads = jax.value_and_grad(
                lambda p: loss_fn(p, features, src, dst_l, labels),
                has_aux=True,
            )(params)
            params, opt_state = optim.apply_updates(
                params, grads, opt_state, t, train_config
            )
            return (params, opt_state), (loss, acc)

        ts = t0 + 1 + jnp.arange(num_epochs, dtype=jnp.int32)
        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state), ts
        )
        return params, opt_state, losses, accs

    return jax.jit(runner, donate_argnums=(0, 1))


def make_sharded_eval_step(
    model_config: ModelConfig,
    mesh: Mesh,
    num_real_nodes: int,
    *,
    axis_name: str = "graph",
    head_axis: str | None = "head",
    **loss_kwargs,
) -> Callable:
    """jit of make_sharded_loss_fn — forwards impl/edge_tiles/halo_plan/
    overlap_* so evaluation runs the SAME configured forward as training."""
    loss_fn = make_sharded_loss_fn(
        model_config, mesh, num_real_nodes, axis_name=axis_name,
        head_axis=head_axis, **loss_kwargs,
    )
    return jax.jit(loss_fn)


def make_sharded_split_eval_step(
    model_config: ModelConfig,
    mesh: Mesh,
    *,
    axis_name: str = "graph",
    head_axis: str | None = "head",
    impl: str = "xla",
    edge_tiles=None,
    interpret: bool = False,
    halo_plan=None,
    overlap_split=None,
    overlap_tiles=None,
) -> Callable:
    """jit(eval)(params, features, src, dst_local, labels, *masks) ->
    per-mask accuracies from ONE sharded full-graph forward. labels/masks
    are partition-ordered global arrays (padding label -1 / mask False);
    the sharded forward comes from the same body as training."""
    loss_fn = make_sharded_loss_fn(
        model_config, mesh, 1, axis_name=axis_name, head_axis=head_axis,
        impl=impl, edge_tiles=edge_tiles, interpret=interpret,
        halo_plan=halo_plan, overlap_split=overlap_split,
        overlap_tiles=overlap_tiles,
    )

    def eval_step(params, features, src, dst_l, labels, *masks):
        logits = loss_fn.logits_fn(params, features, src, dst_l)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        hit = (pred == labels).astype(jnp.float32)
        return tuple(
            jnp.sum(jnp.where(m, hit, 0.0)) / jnp.maximum(jnp.sum(m), 1)
            for m in masks
        )

    return jax.jit(eval_step)


def _put_sharded(arr, sharding: NamedSharding):
    """device_put that also works multi-process: when the sharding spans
    non-addressable devices (a real pod or the 2-process CPU smoke test),
    each process materializes only its addressable shards from the global
    host array (parallel/multihost.py)."""
    import numpy as np

    if jax.process_count() > 1:
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
    return jax.device_put(arr, sharding)


def device_put_params(
    params, model_config: ModelConfig, mesh: Mesh, *, head_axis: str | None = "head"
):
    """Place params with their head-TP shardings (replicated otherwise)."""
    specs = param_specs(model_config, mesh, head_axis=head_axis)
    return jax.tree.map(
        lambda x, s: _put_sharded(x, NamedSharding(mesh, s)), params, specs
    )


def device_put_partitioned(
    pg: PartitionedGraph, mesh: Mesh, *, axis_name: str = "graph"
):
    """Place partitioned arrays with their graph-axis shardings."""
    shard0 = NamedSharding(mesh, P(axis_name, None))
    shard1 = NamedSharding(mesh, P(axis_name))
    return (
        _put_sharded(pg.features, shard0),
        _put_sharded(pg.src, shard1),
        _put_sharded(pg.dst_local, shard1),
        _put_sharded(pg.labels, shard1),
    )


class ShardedTrainer:
    """Multi-chip full-graph trainer (edge partitioning over the 'graph'
    mesh axis), with the reference's console contract. Reached from the CLI
    via --mesh N."""

    def __init__(
        self,
        graph,
        model_config: ModelConfig,
        train_config: TrainConfig,
        num_devices: int,
        *,
        log_fn: Callable[[str], None] = print,
        metrics_sink=None,
        splits=None,
        overlap: bool = False,  # two-pass halo/compute-overlap attention
        #   (xla impl with a boundary halo plan only)
    ):
        import time

        import numpy as np

        from gatv2_tpu.models import gatv2 as _g
        from gatv2_tpu.parallel.mesh import make_mesh
        from gatv2_tpu.parallel.partition import (
            overlap_split_plan,
            partition_graph,
            prepare_partitioned_tiles,
        )

        self.model_config = model_config
        self.train_config = train_config
        self.log = log_fn
        self.metrics_sink = metrics_sink
        self.splits = splits
        from gatv2_tpu.parallel.partition import halo_exchange_plan

        self.mesh = make_mesh(num_devices)
        self.pg = partition_graph(graph, num_devices)
        log_fn(f"Partition: {self.pg.balance_report()}")
        # boundary-only exchange when it moves less data than an all_gather
        plan = halo_exchange_plan(self.pg) if num_devices > 1 else None
        if plan is not None and plan.halo_size >= self.pg.padded_num_nodes:
            plan = None  # no locality in this partition; dense is cheaper
        self.halo_plan = plan
        log_fn(
            "Halo: "
            + (
                f"boundary exchange ({plan.halo_size} rows/shard vs "
                f"{self.pg.padded_num_nodes} all_gather)"
                if plan is not None
                else "all_gather"
            )
        )
        tiles = None
        fused = train_config.impl in ("pallas", "sell")
        if fused and not (overlap and plan is not None):
            if train_config.impl == "pallas":
                tiles = prepare_partitioned_tiles(self.pg, halo_plan=plan)
            else:
                from gatv2_tpu.parallel.partition import (
                    prepare_partitioned_sell_tiles,
                )

                tiles = prepare_partitioned_sell_tiles(
                    self.pg, halo_plan=plan
                )
        ov = None
        ov_tiles = None
        if overlap:
            if plan is None:
                # single-pass tiles were already built above (the outer
                # condition is true when the plan is None)
                log_fn(
                    "Overlap: unavailable (needs a boundary halo plan); "
                    "using the single-pass layer"
                )
            else:
                split = overlap_split_plan(self.pg, plan)
                log_fn(
                    "Overlap: two-pass local/halo attention "
                    f"({split.local_src.shape[1]} local + "
                    f"{split.halo_src.shape[1]} halo edges/shard)"
                )
                if train_config.impl == "pallas":
                    from gatv2_tpu.parallel.partition import (
                        prepare_overlap_tiles,
                    )

                    ov_tiles = prepare_overlap_tiles(self.pg, plan, split)
                elif train_config.impl == "sell":
                    from gatv2_tpu.parallel.partition import (
                        prepare_overlap_sell_tiles,
                        prepare_partitioned_sell_tiles,
                    )

                    try:
                        ov_tiles = prepare_overlap_sell_tiles(
                            self.pg, plan, split
                        )
                    except ValueError as e:
                        # hub-heavy partitions: the merged-softmax layer
                        # needs unsplit layouts — fall back to the
                        # single-pass SELL layer (which splits hub rows)
                        log_fn(f"Overlap: unavailable ({e}); single-pass")
                        tiles = prepare_partitioned_sell_tiles(
                            self.pg, halo_plan=plan
                        )
                else:
                    ov = split
        self.overlap_split = ov
        self.overlap_tiles = ov_tiles
        seed = train_config.seed
        if seed is None:
            seed = int(time.time())
            if jax.process_count() > 1:
                # each process computes its own time — broadcast host 0's so
                # the 'replicated' params really are identical across hosts
                from jax.experimental import multihost_utils

                seed = int(
                    multihost_utils.broadcast_one_to_all(
                        jnp.asarray(seed, jnp.int32)
                    )
                )
        self.params = device_put_params(
            _g.init_params_for_variant(model_config, jax.random.PRNGKey(seed)),
            model_config,
            self.mesh,
        )
        self.opt_state = optim.init_opt_state(
            self.params, train_config.optimizer
        )
        self.data = device_put_partitioned(self.pg, self.mesh)
        self.epoch = 0
        train_labels = self.pg.labels
        num_loss_nodes = self.pg.num_real_nodes
        self._split_eval = None
        if splits is not None:
            # loss masked to train nodes: partition-order labels with -1
            # outside the train split; denominator = train-node count
            masked = splits.masked_labels(graph.labels, "train")
            train_labels = self.pg.scatter_nodes(masked, -1)
            num_loss_nodes = int(splits.train.sum())
            shard1 = NamedSharding(self.mesh, P("graph"))
            self._train_labels_dev = _put_sharded(train_labels, shard1)
            self._eval_labels = _put_sharded(
                self.pg.scatter_nodes(graph.labels, -1), shard1
            )
            self._masks = tuple(
                _put_sharded(self.pg.scatter_nodes(m, False), shard1)
                for m in (splits.train, splits.val, splits.test)
            )
            self._split_eval = make_sharded_split_eval_step(
                model_config, self.mesh, impl=train_config.impl,
                edge_tiles=tiles, halo_plan=plan, overlap_split=ov,
                overlap_tiles=ov_tiles,
            )
            self.data = (self.data[0], self.data[1], self.data[2],
                         self._train_labels_dev)
        self._step = make_sharded_train_step(
            model_config, train_config, self.mesh, num_loss_nodes,
            edge_tiles=tiles, halo_plan=plan, overlap_split=ov,
            overlap_tiles=ov_tiles,
        )

    def evaluate(self) -> dict:
        """Accuracy on the train/val/test splits from one sharded forward."""
        if self._split_eval is None:
            raise ValueError("ShardedTrainer built without splits")
        feats, src, dst_l, _ = self.data
        accs = self._split_eval(
            self.params, feats, src, dst_l, self._eval_labels, *self._masks
        )
        return {k: float(v) for k, v in zip(("train", "val", "test"), accs)}

    def run(self, epochs: int | None = None) -> dict:
        import time

        epochs = epochs if epochs is not None else self.train_config.epochs
        last = {}
        feats, src, dst_l, labels = self.data
        for _ in range(epochs):
            self.epoch += 1
            t0 = time.perf_counter()
            self.params, self.opt_state, loss, acc = self._step(
                self.params, self.opt_state,
                jnp.asarray(self.epoch, jnp.int32),
                feats, src, dst_l, labels,
            )
            loss, acc = float(loss), float(acc)
            dt_ms = (time.perf_counter() - t0) * 1e3
            self.log(f"Epoch {self.epoch}")
            self.log(
                f"Avg Loss: {loss:.6f}, Accuracy: {acc * 100.0:.2f}%  "
                f"total time: {dt_ms:.2f} ms"
            )
            last = {"epoch": self.epoch, "loss": loss, "accuracy": acc, "ms": dt_ms}
            if self._split_eval is not None:
                accs = self.evaluate()
                self.log(
                    f"Train/Val/Test Accuracy: {accs['train'] * 100:.2f}% / "
                    f"{accs['val'] * 100:.2f}% / {accs['test'] * 100:.2f}%"
                )
                last.update({f"{k}_accuracy": v for k, v in accs.items()})
            if self.metrics_sink is not None:
                self.metrics_sink.write(last)
        return last

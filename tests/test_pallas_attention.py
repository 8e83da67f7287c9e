"""Pallas fused attention kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gatv2_tpu.ops.attention import _edge_attention_xla
from gatv2_tpu.ops.pallas_attention import (
    EdgeTiles,
    TILE_E,
    TILE_N,
    edge_attention_pallas,
    prepare_edge_tiles,
)


def _random_inputs(g, h, d, seed=0):
    rng = np.random.default_rng(seed)
    zs = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)).astype(np.float32))
    zd = jnp.asarray(rng.standard_normal((g.num_nodes, h, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((h, d)).astype(np.float32))
    return zs, zd, a


def test_prepare_edge_tiles_layout(tiny_graph):
    g = tiny_graph
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    assert et.padded_num_edges % TILE_E == 0
    assert (et.dst[et.dst < g.num_nodes] == g.dst).all()  # real edges preserved
    assert (np.sort(et.dst) == et.dst[np.argsort(et.dst, kind="stable")]).all()
    # each node tile's range is tile-aligned and contains only its nodes
    for i in range(et.num_node_tiles):
        lo = et.tile_offsets[i] * TILE_E
        hi = et.tile_offsets[i + 1] * TILE_E
        seg = et.dst[lo:hi]
        real = seg[seg < g.num_nodes]
        assert ((real >= i * TILE_N) & (real < (i + 1) * TILE_N)).all()


@pytest.mark.parametrize("h,d", [(1, 8), (4, 16), (2, 64)])
def test_pallas_matches_xla(tiny_graph, h, d):
    g = tiny_graph
    zs, zd, a = _random_inputs(g, h, d)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)

    pe = g.padded_edges(128)
    want = _edge_attention_xla(
        zs, zd, a, jnp.asarray(pe.src), jnp.asarray(pe.dst), g.num_nodes,
        negative_slope=0.01,
    )
    got = edge_attention_pallas(
        zs, zd, a, None, None, g.num_nodes,
        negative_slope=0.01, edge_tiles=et, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_pallas_multi_tile_nodes():
    """More than 128 nodes and a hub node with degree > 128 (multiple edge
    tiles in one node tile; exercises the online-softmax carry)."""
    from gatv2_tpu.data.graph import Graph

    rng = np.random.default_rng(0)
    n = 300
    # hub node 150 receives 200 edges; everyone else 1-3 edges
    dst_list = [150] * 200
    for j in range(n):
        for _ in range(rng.integers(1, 4)):
            dst_list.append(j)
    dst = np.sort(np.asarray(dst_list, np.int32))
    src = rng.integers(0, n, size=dst.size).astype(np.int32)
    counts = np.bincount(dst, minlength=n)
    row_ptr = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=row_ptr[1:])
    g = Graph(
        features=rng.standard_normal((n, 4)).astype(np.float32),
        row_ptr=row_ptr, col_idx=src,
        labels=np.zeros(n, np.int32),
    )
    h, d = 2, 32
    zs, zd, a = _random_inputs(g, h, d, seed=1)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    pe = g.padded_edges(128)
    want = _edge_attention_xla(
        zs, zd, a, jnp.asarray(pe.src), jnp.asarray(pe.dst), n,
        negative_slope=0.01,
    )
    got = edge_attention_pallas(
        zs, zd, a, None, None, n,
        negative_slope=0.01, edge_tiles=et, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("tile_e", [256, 512])
def test_pallas_larger_edge_tiles(tiny_graph, tile_e):
    """Explicit tile_e override: forward + backward stay correct."""
    g = tiny_graph
    h, d = 2, 16
    zs, zd, a = _random_inputs(g, h, d, seed=5)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes, tile_e=tile_e)
    assert et.tile_e == tile_e
    pe = g.padded_edges(128)
    want = _edge_attention_xla(
        zs, zd, a, jnp.asarray(pe.src), jnp.asarray(pe.dst), g.num_nodes,
        negative_slope=0.01,
    )
    got = edge_attention_pallas(
        zs, zd, a, None, None, g.num_nodes,
        negative_slope=0.01, edge_tiles=et, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    def loss_pl(zs, zd, a):
        out = edge_attention_pallas(
            zs, zd, a, None, None, g.num_nodes,
            negative_slope=0.01, edge_tiles=et, interpret=True,
        )
        return jnp.sum(jnp.sin(out))

    def loss_xla(zs, zd, a):
        out = _edge_attention_xla(
            zs, zd, a, jnp.asarray(pe.src), jnp.asarray(pe.dst), g.num_nodes,
            negative_slope=0.01,
        )
        return jnp.sum(jnp.sin(out))

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(zs, zd, a)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(zs, zd, a)
    for a_, b_ in zip(g_xla, g_pl):
        # atol floor: degree-1 dst nodes have true d_zd == 0 but both
        # formulations leave O(eps/p * dalpha) ~ 2e-6 residue from the
        # softmax's +1e-8 denominator; the two paths round it differently
        # (r via <g, out> here vs XLA's per-edge sum — f64-oracle checked,
        # both are equidistant from the true gradient)
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-5, atol=5e-6
        )


def test_src_sorted_tiling_layout(tiny_graph):
    """The backward's transpose-graph (CSC-view) tiling is consistent."""
    g = tiny_graph
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    assert et.src_sorted_ids is not None
    e2 = et.src_sorted_ids.shape[0]
    assert e2 % TILE_E == 0 and et.gather_perm.shape == (e2,)
    real = et.src_sorted_ids < g.num_nodes
    # every real edge of the dst layout appears exactly once
    assert real.sum() == (et.dst < g.num_nodes).sum()
    # gather_perm points each src-sorted slot at an edge with that src id
    assert (et.src[et.gather_perm[real]] == et.src_sorted_ids[real]).all()
    assert (et.dst[et.gather_perm[real]] < g.num_nodes).all()
    # per-tile ranges hold only that tile's src nodes, tile-aligned
    for i in range(et.num_node_tiles):
        lo = et.src_tile_offsets[i] * TILE_E
        hi = et.src_tile_offsets[i + 1] * TILE_E
        seg = et.src_sorted_ids[lo:hi]
        r = seg[seg < g.num_nodes]
        assert ((r >= i * TILE_N) & (r < (i + 1) * TILE_N)).all()


@pytest.mark.parametrize("bwd_impl", ["pallas", "xla"])
def test_pallas_grads_match_xla(tiny_graph, bwd_impl):
    g = tiny_graph
    h, d = 2, 16
    zs, zd, a = _random_inputs(g, h, d, seed=2)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    pe = g.padded_edges(128)

    def loss_xla(zs, zd, a):
        out = _edge_attention_xla(
            zs, zd, a, jnp.asarray(pe.src), jnp.asarray(pe.dst), g.num_nodes,
            negative_slope=0.01,
        )
        return jnp.sum(jnp.sin(out))

    def loss_pl(zs, zd, a):
        out = edge_attention_pallas(
            zs, zd, a, None, None, g.num_nodes,
            negative_slope=0.01, edge_tiles=et, interpret=True,
            bwd_impl=bwd_impl,
        )
        return jnp.sum(jnp.sin(out))

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(zs, zd, a)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(zs, zd, a)
    for a_, b_ in zip(g_xla, g_pl):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-5, atol=2e-6
        )


def test_pallas_grads_16_heads_stats_boundary(tiny_graph):
    """num_heads == STATS_L (16): the sigma_r stream is completely full
    (sigma lanes [0,16), r lanes [16,32)), so the backward's lane-roll
    wraps real sigma values (|sigma| can be ~1e30 on padding rows) into
    lanes [112,128) of the r term — the worst case for the kernel's lane
    hygiene (annihilated only because r_mat rows >= num_heads are zero)."""
    g = tiny_graph
    h, d = 16, 8
    zs, zd, a = _random_inputs(g, h, d, seed=5)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    pe = g.padded_edges(128)

    def loss_xla(zs, zd, a):
        out = _edge_attention_xla(
            zs, zd, a, jnp.asarray(pe.src), jnp.asarray(pe.dst), g.num_nodes,
            negative_slope=0.01,
        )
        return jnp.sum(jnp.sin(out))

    def loss_pl(zs, zd, a):
        out = edge_attention_pallas(
            zs, zd, a, None, None, g.num_nodes,
            negative_slope=0.01, edge_tiles=et, interpret=True,
        )
        return jnp.sum(jnp.sin(out))

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(zs, zd, a)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(zs, zd, a)
    for a_, b_ in zip(g_xla, g_pl):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-5, atol=2e-6
        )
        assert np.isfinite(np.asarray(b_)).all()


def test_pallas_bwd_multi_tile_hub():
    """Pallas backward on a graph with >128 nodes, a degree-200 dst hub
    (multi-edge-tile online stats in the bwd recompute) and a src hub
    (multi-edge-tile segment sum in the d_zs kernel)."""
    from gatv2_tpu.data.graph import Graph

    rng = np.random.default_rng(3)
    n = 300
    dst_list = [150] * 200  # dst hub
    for j in range(n):
        for _ in range(rng.integers(1, 4)):
            dst_list.append(j)
    dst = np.sort(np.asarray(dst_list, np.int32))
    src = rng.integers(0, n, size=dst.size).astype(np.int32)
    src[: src.size // 2] = 42  # src hub feeding many dst segments
    counts = np.bincount(dst, minlength=n)
    row_ptr = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=row_ptr[1:])
    g = Graph(
        features=rng.standard_normal((n, 4)).astype(np.float32),
        row_ptr=row_ptr, col_idx=src,
        labels=np.zeros(n, np.int32),
    )
    h, d = 2, 32
    zs, zd, a = _random_inputs(g, h, d, seed=4)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    pe = g.padded_edges(128)

    def loss_xla(zs, zd, a):
        out = _edge_attention_xla(
            zs, zd, a, jnp.asarray(pe.src), jnp.asarray(pe.dst), n,
            negative_slope=0.01,
        )
        return jnp.sum(jnp.cos(out))

    def loss_pl(zs, zd, a):
        out = edge_attention_pallas(
            zs, zd, a, None, None, n,
            negative_slope=0.01, edge_tiles=et, interpret=True,
        )
        return jnp.sum(jnp.cos(out))

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(zs, zd, a)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(zs, zd, a)
    for a_, b_ in zip(g_xla, g_pl):
        # tolerances dominated by f32 summation-order differences over the
        # 200-edge hub segment (cancellation in alpha*(dalpha - r); d_a sums
        # ~1000 edge terms in per-tile order vs XLA's reduction tree)
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=2e-5
        )


@pytest.mark.parametrize("num_chunks", [2, 5])
def test_pallas_chunked_matches_unchunked(num_chunks):
    """Chunked execution (node-tile groups) is numerically identical to the
    single-chunk path, forward and backward."""
    from gatv2_tpu.data.graph import Graph

    rng = np.random.default_rng(11)
    n = 700  # 6 node tiles -> chunks of 3 / 2 tiles
    deg = rng.integers(1, 6, size=n)
    dst = np.repeat(np.arange(n, dtype=np.int32), deg)
    src = rng.integers(0, n, size=dst.size).astype(np.int32)
    row_ptr = np.zeros(n + 1, np.int32)
    np.cumsum(np.bincount(dst, minlength=n), out=row_ptr[1:])
    g = Graph(
        features=rng.standard_normal((n, 4)).astype(np.float32),
        row_ptr=row_ptr, col_idx=src,
        labels=np.zeros(n, np.int32),
    )
    h, d = 2, 16
    zs, zd, a = _random_inputs(g, h, d, seed=12)
    et1 = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes, tile_e=128)
    etc = prepare_edge_tiles(
        g.row_ptr, g.col_idx, g.num_nodes, tile_e=128, num_chunks=num_chunks
    )
    assert etc.num_chunks == num_chunks

    def loss(et):
        def f(zs, zd, a):
            out = edge_attention_pallas(
                zs, zd, a, None, None, n,
                negative_slope=0.01, edge_tiles=et, interpret=True,
            )
            return jnp.sum(jnp.sin(out)), out
        return f

    (l1, o1), g1 = jax.value_and_grad(loss(et1), argnums=(0, 1, 2), has_aux=True)(zs, zd, a)
    (lc, oc), gc = jax.value_and_grad(loss(etc), argnums=(0, 1, 2), has_aux=True)(zs, zd, a)
    np.testing.assert_allclose(np.asarray(oc), np.asarray(o1), rtol=1e-6, atol=1e-7)
    for a_, b_ in zip(g1, gc):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("num_chunks", [1, 3])
def test_pallas_bipartite(num_chunks):
    """Bipartite edge sets (sharded layers): src ids live in a GLOBAL node
    space, dst ids in a smaller local space. Forward + grads vs a jnp
    oracle."""
    from gatv2_tpu.ops.segment import segment_softmax, segment_sum

    rng = np.random.default_rng(21)
    n_loc, n_glob = 300, 900
    deg = rng.integers(1, 5, size=n_loc)
    dst = np.repeat(np.arange(n_loc, dtype=np.int32), deg)
    src = rng.integers(0, n_glob, size=dst.size).astype(np.int32)
    row_ptr = np.zeros(n_loc + 1, np.int32)
    np.cumsum(np.bincount(dst, minlength=n_loc), out=row_ptr[1:])

    h, d = 2, 16
    zs = jnp.asarray(rng.standard_normal((n_glob, h, d)).astype(np.float32))
    zd = jnp.asarray(rng.standard_normal((n_loc, h, d)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((h, d)).astype(np.float32))

    et = prepare_edge_tiles(
        row_ptr, src, n_loc, tile_e=128, num_chunks=num_chunks,
        num_src_nodes=n_glob,
    )
    assert et.src_num_nodes == n_glob

    src_j, dst_j = jnp.asarray(src), jnp.asarray(dst)

    def oracle(zs, zd, a):
        s = jax.nn.leaky_relu(
            jnp.take(zs, src_j, axis=0) + jnp.take(zd, dst_j, axis=0), 0.01
        )
        e = jnp.einsum("ehd,hd->eh", s, a)
        alpha = segment_softmax(e, dst_j, n_loc)
        return segment_sum(
            alpha[:, :, None] * jnp.take(zs, src_j, axis=0), dst_j, n_loc
        )

    def pallas(zs, zd, a):
        return edge_attention_pallas(
            zs, zd, a, None, None, n_loc,
            negative_slope=0.01, edge_tiles=et, interpret=True,
        )

    want = oracle(zs, zd, a)
    got = pallas(zs, zd, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    g_or = jax.grad(lambda *t: jnp.sum(jnp.sin(oracle(*t))), argnums=(0, 1, 2))(zs, zd, a)
    g_pl = jax.grad(lambda *t: jnp.sum(jnp.sin(pallas(*t))), argnums=(0, 1, 2))(zs, zd, a)
    for a_, b_ in zip(g_or, g_pl):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=2e-5, atol=2e-6
        )


def test_isolated_nodes_zero_output():
    """Zero-degree nodes produce exactly 0 (the reference leaves them to the
    +1e-8 guard, E:379); gradients stay finite."""
    from gatv2_tpu.data.graph import Graph

    rng = np.random.default_rng(31)
    n = 200
    # only even nodes receive edges
    dst = np.repeat(np.arange(0, n, 2, dtype=np.int32), 3)
    dst = np.sort(dst)
    src = rng.integers(0, n, size=dst.size).astype(np.int32)
    row_ptr = np.zeros(n + 1, np.int32)
    np.cumsum(np.bincount(dst, minlength=n), out=row_ptr[1:])
    g = Graph(
        features=rng.standard_normal((n, 4)).astype(np.float32),
        row_ptr=row_ptr, col_idx=src, labels=np.zeros(n, np.int32),
    )
    h, d = 2, 16
    zs, zd, a = _random_inputs(g, h, d, seed=32)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    out = edge_attention_pallas(
        zs, zd, a, None, None, n,
        negative_slope=0.01, edge_tiles=et, interpret=True,
    )
    out = np.asarray(out)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[1::2], 0.0)  # isolated nodes
    assert np.abs(out[0::2]).sum() > 0

    grads = jax.grad(
        lambda zs, zd, a: jnp.sum(
            jnp.sin(
                edge_attention_pallas(
                    zs, zd, a, None, None, n,
                    negative_slope=0.01, edge_tiles=et, interpret=True,
                )
            )
        ),
        argnums=(0, 1, 2),
    )(zs, zd, a)
    for g_ in grads:
        assert np.isfinite(np.asarray(g_)).all()


def test_high_precision_tier_near_f32(tiny_graph):
    """'high' (mixed bf16x3 with exact-f32 sensitive dots) tracks 'highest'
    closely in forward and gradients."""
    g = tiny_graph
    h, d = 2, 16
    zs, zd, a = _random_inputs(g, h, d, seed=41)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)

    def run(p):
        def loss(zs, zd, a):
            return jnp.sum(
                jnp.sin(
                    edge_attention_pallas(
                        zs, zd, a, None, None, g.num_nodes,
                        negative_slope=0.01, edge_tiles=et, interpret=True,
                        precision=p,
                    )
                )
            )
        val = loss(zs, zd, a)
        grads = jax.grad(loss, argnums=(0, 1, 2))(zs, zd, a)
        return val, grads

    v0, g0 = run("highest")
    v1, g1 = run("high")
    assert float(v1) == pytest.approx(float(v0), rel=1e-4)
    for a_, b_ in zip(g0, g1):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        peak = np.abs(a_).max() + 1e-12
        rel = np.abs(a_ - b_) / peak
        # bulk of elements near-f32; allow isolated LeakyReLU-kink flips
        assert np.percentile(rel, 99.9) < 1e-4


def test_fixed_edge_tiles_validation(tiny_graph):
    g = tiny_graph
    with pytest.raises(ValueError, match="too small"):
        prepare_edge_tiles(
            g.row_ptr, g.col_idx, g.num_nodes, tile_e=128, fixed_edge_tiles=1
        )
    with pytest.raises(ValueError, match="num_chunks"):
        prepare_edge_tiles(
            g.row_ptr, g.col_idx, g.num_nodes, tile_e=128,
            fixed_edge_tiles=64, num_chunks=2,
        )


def test_pallas_many_heads_matches_xla(tiny_graph):
    """>STATS_L heads run as independent head groups (no hard limit; the
    round-1 guard used to reject this case). Forward AND grads match the
    XLA oracle."""
    from gatv2_tpu.ops.attention import _edge_attention_xla

    g = tiny_graph
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    h, d = 17, 4  # > STATS_L compact-stat lanes
    zs, zd, a = _random_inputs(g, h, d, seed=50)
    pe = g.padded_edges(128)
    src = jnp.asarray(pe.src)
    dst = jnp.asarray(pe.dst)

    def loss_pl(zs, zd, a):
        return jnp.sum(
            jnp.sin(
                edge_attention_pallas(
                    zs, zd, a, None, None, g.num_nodes,
                    negative_slope=0.01, edge_tiles=et, interpret=True,
                )
            )
        )

    def loss_xla(zs, zd, a):
        return jnp.sum(
            jnp.sin(
                _edge_attention_xla(
                    zs, zd, a, src, dst, g.num_nodes, negative_slope=0.01
                )
            )
        )

    v_pl, v_xla = loss_pl(zs, zd, a), loss_xla(zs, zd, a)
    assert float(v_pl) == pytest.approx(float(v_xla), rel=1e-5)
    # flat [N, H*D] layout (the Trainer's pallas fast path) slices the same
    # head-major groups
    h_flat = edge_attention_pallas(
        zs.reshape(zs.shape[0], -1), zd.reshape(zd.shape[0], -1), a,
        None, None, g.num_nodes, negative_slope=0.01, edge_tiles=et,
        interpret=True,
    )
    v_flat = float(jnp.sum(jnp.sin(h_flat[:, : h * d])))
    assert v_flat == pytest.approx(float(v_xla), rel=1e-5)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(zs, zd, a)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(zs, zd, a)
    for a_, b_ in zip(g_pl, g_xla):
        np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-6
        )


def test_chunked_xla_bwd_guard():
    from gatv2_tpu.data.synthetic import random_graph

    g = random_graph(300, 1200, 8, 3, seed=52)  # >1 node tile
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes, num_chunks=2)
    assert et.num_chunks == 2
    zs, zd, a = _random_inputs(g, 2, 8, seed=51)
    with pytest.raises(ValueError, match="bwd_impl='xla' is unavailable"):
        edge_attention_pallas(
            zs, zd, a, None, None, g.num_nodes,
            negative_slope=0.01, edge_tiles=et, interpret=True,
            bwd_impl="xla",
        )


def test_merge_two_pass_matches_oracle(tiny_graph):
    """edge_attention_pallas_merge: attention over two edge subsets with a
    merged per-destination softmax equals the XLA oracle over the union —
    forward and ALL gradients (the Pallas halo/compute-overlap primitive)."""
    from gatv2_tpu.ops.attention import _edge_attention_xla
    from gatv2_tpu.ops.pallas_attention import edge_attention_pallas_merge

    g = tiny_graph
    h, d = 3, 8
    zs, zd, a = _random_inputs(g, h, d, seed=60)

    # split edges by src parity into two subsets (both on the full node
    # space), each with its own dst-sorted CSR + tiling
    src_all, dst_all = g.src, g.dst
    tiles, subsets = [], []
    for part in (0, 1):
        sel = (src_all % 2) == part
        s_k, d_k = src_all[sel], dst_all[sel]
        order = np.argsort(d_k, kind="stable")
        s_k, d_k = s_k[order], d_k[order]
        row_ptr = np.zeros(g.num_nodes + 1, np.int64)
        np.cumsum(np.bincount(d_k, minlength=g.num_nodes), out=row_ptr[1:])
        tiles.append(prepare_edge_tiles(row_ptr, s_k, g.num_nodes))
        subsets.append((s_k, d_k))
    assert subsets[0][0].size + subsets[1][0].size == g.num_edges

    def loss_merge(zs1, zs2, zd, a):
        out = edge_attention_pallas_merge(
            (zs1, zs2), zd, a, g.num_nodes,
            negative_slope=0.01, edge_tiles_parts=tiles, interpret=True,
        )
        return jnp.sum(jnp.sin(out))

    pe = g.padded_edges(128)

    def loss_xla(zs, zd, a):
        out = _edge_attention_xla(
            zs, zd, a, jnp.asarray(pe.src), jnp.asarray(pe.dst),
            g.num_nodes, negative_slope=0.01,
        )
        return jnp.sum(jnp.sin(out))

    v_m = loss_merge(zs, zs, zd, a)
    v_x = loss_xla(zs, zd, a)
    assert float(v_m) == pytest.approx(float(v_x), rel=1e-5)

    g_m = jax.grad(loss_merge, argnums=(0, 1, 2, 3))(zs, zs, zd, a)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(zs, zd, a)
    # dzs splits across the two passes; their sum is the oracle's dzs
    np.testing.assert_allclose(
        np.asarray(g_m[0] + g_m[1]), np.asarray(g_x[0]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_m[2]), np.asarray(g_x[1]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_m[3]), np.asarray(g_x[2]), rtol=1e-4, atol=1e-6
    )


def test_precision_spec_normalization(tiny_graph):
    """edge_attention(impl='pallas') accepts enum/string/uniform-tuple
    precision specs and rejects unknown ones with a clear error."""
    import jax.lax as lax

    from gatv2_tpu.ops.attention import edge_attention

    g = tiny_graph
    zs, zd, a = _random_inputs(g, 2, 8, seed=70)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)

    def run(prec):
        return edge_attention(
            zs, zd, a, None, None, g.num_nodes, negative_slope=0.01,
            impl="pallas", edge_tiles=et, precision=prec, interpret=True,
        )

    want = run(lax.Precision.HIGHEST)
    for spec in ("highest", "float32",
                 (lax.Precision.HIGHEST, lax.Precision.HIGHEST)):
        np.testing.assert_allclose(
            np.asarray(run(spec)), np.asarray(want), rtol=1e-6
        )
    with pytest.raises(ValueError, match="does not understand precision"):
        run("banana")
    with pytest.raises(ValueError, match="uniform precision"):
        run((lax.Precision.HIGHEST, lax.Precision.DEFAULT))


@pytest.mark.parametrize("bwd_impl", ["pallas", "xla"])
def test_padded_node_space_grads(bwd_impl):
    """Node-padded inputs (the Trainer's layout: N not a lane multiple,
    zs/zd/num_nodes padded to the tile grid): gradients on real rows match
    the unpadded oracle and padding-row gradients are exactly zero.
    Round-2 review: the src-sorted pad id used to collide with live row N,
    and bwd_impl='xla' ran its recompute in the padded segment space."""
    from gatv2_tpu.data.synthetic import random_graph

    g = random_graph(150, 700, 8, 3, seed=42)  # 150 % 128 != 0
    h, d = 2, 8
    zs, zd, a = _random_inputs(g, h, d, seed=43)
    et = prepare_edge_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    n_pad = et.padded_num_nodes
    assert n_pad != g.num_nodes
    zs_p = jnp.pad(zs, ((0, n_pad - 150), (0, 0), (0, 0)))
    zd_p = jnp.pad(zd, ((0, n_pad - 150), (0, 0), (0, 0)))

    def loss_pl(zs_, zd_, a_):
        out = edge_attention_pallas(
            zs_, zd_, a_, None, None, n_pad,
            negative_slope=0.01, edge_tiles=et, interpret=True,
            bwd_impl=bwd_impl,
        )
        return jnp.sum(jnp.sin(out[:150]))

    pe = g.padded_edges(128)

    def loss_xla(zs_, zd_, a_):
        out = _edge_attention_xla(
            zs_, zd_, a_, jnp.asarray(pe.src), jnp.asarray(pe.dst),
            g.num_nodes, negative_slope=0.01,
        )
        return jnp.sum(jnp.sin(out))

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(zs_p, zd_p, a)
    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(zs, zd, a)
    for got, want in zip(g_pl[:2], g_ref[:2]):
        got = np.asarray(got)
        np.testing.assert_allclose(got[:150], np.asarray(want),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_array_equal(got[150:], 0.0)  # padding rows
    np.testing.assert_allclose(np.asarray(g_pl[2]), np.asarray(g_ref[2]),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.fast
def test_kdot_exact_arg_triple_split_matches_f32():
    """The exact_arg bf16-triple-split (_kdot) — the path every mask/
    selector matmul takes ON THE REAL TPU under the default 'highest'
    precision — stays in the f32-accumulation precision class against a
    0/1 mask operand.

    Interpret-mode kernel tests never execute this branch (_prec_for maps
    interpret+'highest' to plain f32 dots), so this unit test pins the
    split math itself. The three bf16 terms capture all 24 significand
    bits per element (each product is exact in f32), so the only error
    source left is f32 accumulation ordering — asserted against a float64
    reference, normalized by the absolute-value accumulation |mask|@|x|
    (the correct scale under cancellation), with the same bound the plain
    f32 matmul satisfies."""
    from gatv2_tpu.ops.pallas_attention import _HIGHEST, _kdot

    rng = np.random.default_rng(7)
    # x spans several binades to stress the residual splits
    x_np = (
        rng.standard_normal((96, 256)) * np.exp(rng.uniform(-8, 8, (96, 256)))
    ).astype(np.float32)
    mask_np = (rng.random((128, 96)) < 0.06).astype(np.float32)
    x, mask = jnp.asarray(x_np), jnp.asarray(mask_np)
    dn = (((1,), (0,)), ((), ()))

    want64 = mask_np.astype(np.float64) @ x_np.astype(np.float64)
    scale = mask_np.astype(np.float64) @ np.abs(x_np, dtype=np.float64)
    # f32 accumulation class: a few ulps of the absolute-value sum
    bound = 8 * 2.0**-24 * scale + 1e-30
    for prec in (_HIGHEST, "bf16x3"):
        got = np.asarray(_kdot(mask, x, dn, prec, exact_arg=0), np.float64)
        assert (np.abs(got - want64) <= bound).all(), prec
    # exact_arg=1 mirror (operand order swapped)
    got = np.asarray(
        _kdot(x.T, mask.T, (((1,), (0,)), ((), ())), _HIGHEST, exact_arg=1),
        np.float64,
    )
    assert (np.abs(got - want64.T) <= bound.T).all()


@pytest.mark.fast
def test_kdot_bf16x3_and_sensitive_tiers():
    """'bf16x3' (hi/lo split, al.bl term dropped) keeps ~2^-16 relative
    error of the absolute-value accumulation — far tighter than bf16's
    2^-8 and the class the 'high' tier's measured ~5e-6 grad error relies
    on; sensitive=True under 'bf16x3' falls back to the exact f32
    product."""
    from gatv2_tpu.ops.pallas_attention import _HIGHEST, _kdot

    rng = np.random.default_rng(11)
    a_np = rng.standard_normal((64, 128)).astype(np.float32)
    b_np = rng.standard_normal((128, 64)).astype(np.float32)
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)
    dn = (((1,), (0,)), ((), ()))
    want64 = a_np.astype(np.float64) @ b_np.astype(np.float64)
    scale = np.abs(a_np, dtype=np.float64) @ np.abs(b_np, dtype=np.float64)

    got = np.asarray(_kdot(a, b, dn, "bf16x3"), np.float64)
    err = np.abs(got - want64) / scale
    assert err.max() < 2.0**-14  # dropped al.bl term: ~2^-16 per product

    want32 = jax.lax.dot_general(
        a, b, dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )
    got_sens = _kdot(a, b, dn, "bf16x3", sensitive=True)
    np.testing.assert_array_equal(np.asarray(got_sens), np.asarray(want32))


@pytest.mark.fast
def test_suggest_num_chunks_budgets_unchunked_packet_buffer():
    """G=1 is only chosen when the emit_c1 live set (4*hd+128 lanes: zs +
    [zd|g|sigma_r] + the c1 packet buffer) fits the budget; edge counts
    that fit only the chunked width (3*hd+128) must chunk."""
    from gatv2_tpu.ops.pallas_attention import suggest_num_chunks

    hd, budget = 128, 1 << 20
    e_chunk_only = budget // ((3 * hd + 128) * 4)
    assert suggest_num_chunks(e_chunk_only, hd, budget_bytes=budget) >= 2
    e_unchunked = budget // ((4 * hd + 128) * 4)
    assert suggest_num_chunks(e_unchunked, hd, budget_bytes=budget) == 1

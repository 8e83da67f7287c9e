"""SELL-layout kernel tests: layout invariants, forward/grad parity vs the
XLA oracle (ops.attention._edge_attention_xla), and edge cases (empty rows,
lane padding, head grouping). All run in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gatv2_tpu.data.synthetic import random_graph
from gatv2_tpu.ops.attention import _edge_attention_xla, edge_attention
from gatv2_tpu.ops.sell_attention import (
    TILE_N,
    prepare_sell_tiles,
    sell_attention,
)


def _coo(g):
    dst = np.repeat(
        np.arange(g.num_nodes, dtype=np.int32), np.diff(g.row_ptr)
    )
    return np.asarray(g.col_idx, np.int32), dst


def _real_slots(side):
    """Expand the per-column valid-row counts to a [e_ell] bool mask:
    slot (col, row) is a real edge iff row < cnt[col] (the prefix contract
    the kernels' iota masking relies on)."""
    cnt = np.asarray(side.cnt)
    rows = np.arange(TILE_N)
    return (rows[None, :] < cnt[:, None]).reshape(-1)


def _rand_zza(n, h, d, seed, flat=False):
    rng = np.random.default_rng(seed)
    zs = rng.normal(size=(n, h, d)).astype(np.float32)
    zd = rng.normal(size=(n, h, d)).astype(np.float32)
    a = rng.normal(size=(h, d)).astype(np.float32)
    if flat:
        zs, zd = zs.reshape(n, h * d), zd.reshape(n, h * d)
    return jnp.asarray(zs), jnp.asarray(zd), jnp.asarray(a)


def _ref(zs, zd, a, src, dst, n, flat=False):
    if flat:
        h, d = a.shape
        out = _edge_attention_xla(
            zs.reshape(n, h, d), zd.reshape(n, h, d), a,
            jnp.asarray(src), jnp.asarray(dst), n, negative_slope=0.2,
        )
        return out.reshape(n, h * d)
    return _edge_attention_xla(
        zs, zd, a, jnp.asarray(src), jnp.asarray(dst), n,
        negative_slope=0.2,
    )


@pytest.mark.fast
def test_layout_invariants():
    g = random_graph(
        num_nodes=500, num_edges=2300, feature_dim=8, num_classes=3, seed=11
    )
    st = prepare_sell_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    src_all, dst_all = _coo(g)
    perm = np.asarray(st.dst.perm)
    inv = np.asarray(st.dst.inv)
    ids = np.asarray(st.dst.gather_ids)
    col_off = np.asarray(st.dst.col_off)
    assert np.array_equal(perm[inv], np.arange(len(perm)))
    # in-degree descending within the permutation
    deg = np.zeros(len(perm), np.int64)
    deg[: g.num_nodes] = np.diff(g.row_ptr)
    assert np.all(np.diff(deg[perm]) <= 0)
    # every real edge appears exactly once, in its dst's row, inside the
    # column's valid-row prefix (the cnt contract)
    real = _real_slots(st.dst)
    assert real.sum() == g.num_edges
    slots = np.nonzero(real)[0]
    cols = slots // TILE_N
    rows = slots % TILE_N
    t_of_col = np.searchsorted(col_off, cols, side="right") - 1
    node_of_slot = perm[t_of_col * TILE_N + rows]
    # per-dst multiset of sources matches the CSR
    got = sorted(zip(node_of_slot.tolist(), ids[slots].tolist()))
    want = sorted(zip(dst_all.tolist(), src_all.tolist()))
    assert got == want
    # padding slots gather the appended zero row
    assert np.all(ids[~real] == st.padded_src_nodes)
    # ell_perm maps each real edge to a real dst-ELL slot, pads to e_ell
    ep = np.asarray(st.ell_perm)
    real2 = ep < st.e_ell
    assert real2.sum() == g.num_edges
    assert np.all(_real_slots(st.srcs)[real2])
    assert np.array_equal(np.sort(ep[real2]), np.sort(slots))


@pytest.mark.fast
def test_split_layout_invariants():
    """Virtual-row layout: every edge lands exactly once, within <= cap
    columns of a row mapped to its dst node; vsort/sids order by node."""
    from gatv2_tpu.data.synthetic import powerlaw_graph
    from gatv2_tpu.ops.sell_attention import DEFAULT_SPLIT_CAP

    g = powerlaw_graph(800, 9000, 8, 3, seed=17, alpha=1.2)
    st = prepare_sell_tiles(g.row_ptr, g.col_idx, g.num_nodes)
    assert st.dst.split
    src_all, dst_all = _coo(g)
    perm = np.asarray(st.dst.perm)
    ids = np.asarray(st.dst.gather_ids)
    col_off = np.asarray(st.dst.col_off)
    real = _real_slots(st.dst)
    assert real.sum() == g.num_edges
    slots = np.nonzero(real)[0]
    cols = slots // TILE_N
    rows = slots % TILE_N
    t_of_col = np.searchsorted(col_off, cols, side="right") - 1
    vrow = t_of_col * TILE_N + rows
    node_of_slot = perm[vrow]
    # per-dst multiset of sources matches CSR, across a node's split rows
    got = sorted(zip(node_of_slot.tolist(), ids[slots].tolist()))
    want = sorted(zip(dst_all.tolist(), src_all.tolist()))
    assert got == want
    # each virtual row holds at most cap edges
    per_vrow = np.bincount(vrow, minlength=len(perm))
    assert per_vrow.max() <= DEFAULT_SPLIT_CAP
    # split rows of one node are contiguous groups under vsort, and sids
    # is exactly perm[vsort] ascending with pads last
    vsort = np.asarray(st.dst.vsort)
    sids = np.asarray(st.dst.sids)
    assert np.array_equal(sids, perm[vsort])
    assert np.all(np.diff(sids) >= 0)
    # padding slots gather the appended zero row of the src node grid
    assert np.all(ids[~real] == st.padded_src_nodes)


@pytest.mark.fast
@pytest.mark.parametrize(
    "h,d,flat",
    [
        (4, 32, False),
        (1, 16, True),
        (2, 60, False),  # hd_real=120: lane padding
        (3, 24, False),  # odd head count, non-power-of-two dim (hd=72)
        (5, 40, True),  # hd_real=200: padding crosses a head boundary
    ],
)
def test_sell_forward_parity(h, d, flat):
    g = random_graph(
        num_nodes=300, num_edges=1400, feature_dim=8, num_classes=3, seed=3
    )
    n = g.num_nodes
    src_all, dst_all = _coo(g)
    zs, zd, a = _rand_zza(n, h, d, 0, flat=flat)
    st = prepare_sell_tiles(g.row_ptr, g.col_idx, n)
    out = sell_attention(
        zs, zd, a, None, None, n, negative_slope=0.2, sell_tiles=st,
        interpret=True,
    )
    ref = _ref(zs, zd, a, src_all, dst_all, n, flat=flat)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.fast
def test_sell_grad_parity():
    g = random_graph(
        num_nodes=300, num_edges=1400, feature_dim=8, num_classes=3, seed=5
    )
    n = g.num_nodes
    src_all, dst_all = _coo(g)
    zs, zd, a = _rand_zza(n, 4, 32, 1)
    st = prepare_sell_tiles(g.row_ptr, g.col_idx, n)

    def loss_sell(zs, zd, a):
        o = sell_attention(
            zs, zd, a, None, None, n, negative_slope=0.2, sell_tiles=st,
            interpret=True,
        )
        return jnp.sum(jnp.sin(o))

    def loss_ref(zs, zd, a):
        return jnp.sum(jnp.sin(_ref(zs, zd, a, src_all, dst_all, n)))

    gs = jax.grad(loss_sell, argnums=(0, 1, 2))(zs, zd, a)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(zs, zd, a)
    for x, y in zip(gs, gr):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=5e-5)


def test_sell_empty_rows_and_hubs():
    """Isolated nodes (empty softmax rows) and one high-degree hub: outputs
    match the oracle and gradients stay finite and correct."""
    # hand-built CSR: node 0 is a hub (deg 200), nodes 1..50 deg 0,
    # the rest sparse
    n = 260
    rng = np.random.default_rng(7)
    deg = np.zeros(n, np.int64)
    deg[0] = 200
    deg[51:] = rng.integers(0, 4, size=n - 51)
    row_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=row_ptr[1:])
    col_idx = rng.integers(0, n, size=int(row_ptr[-1])).astype(np.int32)
    dst_all = np.repeat(np.arange(n, dtype=np.int32), deg)

    zs, zd, a = _rand_zza(n, 2, 16, 2)
    st = prepare_sell_tiles(row_ptr, col_idx, n)

    def loss_sell(zs, zd, a):
        o = sell_attention(
            zs, zd, a, None, None, n, negative_slope=0.2, sell_tiles=st,
            interpret=True,
        )
        return jnp.sum(jnp.cos(o)), o

    (_, out), gs = jax.value_and_grad(
        loss_sell, argnums=(0, 1, 2), has_aux=True
    )(zs, zd, a)
    ref = _ref(zs, zd, a, col_idx, dst_all, n)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    # empty rows produce exactly zero
    np.testing.assert_array_equal(np.asarray(out)[1:51], 0.0)

    def loss_ref(zs, zd, a):
        return jnp.sum(jnp.cos(_ref(zs, zd, a, col_idx, dst_all, n)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(zs, zd, a)
    for x, y in zip(gs, gr):
        assert np.all(np.isfinite(x))
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=5e-5)


def test_sell_head_group_split():
    """>STATS_L heads run as independent groups and still match."""
    g = random_graph(
        num_nodes=150, num_edges=600, feature_dim=8, num_classes=3, seed=9
    )
    n = g.num_nodes
    src_all, dst_all = _coo(g)
    zs, zd, a = _rand_zza(n, 18, 8, 3)
    st = prepare_sell_tiles(g.row_ptr, g.col_idx, n)
    out = sell_attention(
        zs, zd, a, None, None, n, negative_slope=0.2, sell_tiles=st,
        interpret=True,
    )
    ref = _ref(zs, zd, a, src_all, dst_all, n)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.fast
def test_sell_chunked_parity():
    """num_chunks > 1 (scan-grouped gathers, phase-2b recompute backward)
    matches both the oracle and the unchunked packet path."""
    g = random_graph(
        num_nodes=700, num_edges=3200, feature_dim=8, num_classes=3, seed=13
    )
    n = g.num_nodes
    src_all, dst_all = _coo(g)
    zs, zd, a = _rand_zza(n, 2, 32, 8)
    st1 = prepare_sell_tiles(g.row_ptr, g.col_idx, n)
    st3 = prepare_sell_tiles(g.row_ptr, g.col_idx, n, num_chunks=3)
    assert st3.num_chunks == 3
    assert st3.e_ell == st1.e_ell  # balancing never changes slice widths

    def loss(st):
        def f(zs, zd, a):
            o = sell_attention(
                zs, zd, a, None, None, n, negative_slope=0.2,
                sell_tiles=st, interpret=True,
            )
            return jnp.sum(jnp.sin(o)), o

        return f

    (v3, o3), g3 = jax.value_and_grad(
        loss(st3), argnums=(0, 1, 2), has_aux=True
    )(zs, zd, a)
    (v1, o1), g1 = jax.value_and_grad(
        loss(st1), argnums=(0, 1, 2), has_aux=True
    )(zs, zd, a)
    np.testing.assert_allclose(o3, o1, rtol=1e-6, atol=1e-6)
    ref = _ref(zs, zd, a, src_all, dst_all, n)
    np.testing.assert_allclose(o3, ref, rtol=2e-5, atol=2e-5)

    def loss_ref(zs, zd, a):
        return jnp.sum(jnp.sin(_ref(zs, zd, a, src_all, dst_all, n)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(zs, zd, a)
    for x3, x1, xr in zip(g3, g1, gr):
        np.testing.assert_allclose(x3, xr, rtol=2e-4, atol=5e-5)
        np.testing.assert_allclose(x3, x1, rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_sell_split_rows_powerlaw():
    """Hub degrees above the split cap engage virtual-row splitting: the
    layout stays tight (overhead ~1x, not the hub-degree blowup) and the
    merged forward/backward match the oracle exactly."""
    from gatv2_tpu.data.synthetic import powerlaw_graph

    g = powerlaw_graph(1200, 20000, 8, 3, seed=4, alpha=1.2)
    n = g.num_nodes
    deg = np.diff(g.row_ptr)
    assert deg.max() > 256  # the fixture must actually exceed the cap
    src_all, dst_all = _coo(g)
    zs, zd, a = _rand_zza(n, 2, 32, 21)
    st = prepare_sell_tiles(g.row_ptr, g.col_idx, n)
    assert st.dst.split and st.srcs.split
    # no hub blowup: splitting must beat the unsplit layout by a wide
    # margin (small graphs carry some slice-boundary noise, hence relative)
    st_unsplit = prepare_sell_tiles(
        g.row_ptr, g.col_idx, n, split_cap=None
    )
    assert st.pad_overhead < st_unsplit.pad_overhead / 3
    assert st.pad_overhead < 2.5

    def loss_sell(zs, zd, a):
        o = sell_attention(
            zs, zd, a, None, None, n, negative_slope=0.2, sell_tiles=st,
            interpret=True,
        )
        return jnp.sum(jnp.sin(o)), o

    (_, out), gs = jax.value_and_grad(
        loss_sell, argnums=(0, 1, 2), has_aux=True
    )(zs, zd, a)
    ref = _ref(zs, zd, a, src_all, dst_all, n)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def loss_ref(zs, zd, a):
        return jnp.sum(jnp.sin(_ref(zs, zd, a, src_all, dst_all, n)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(zs, zd, a)
    for x, y in zip(gs, gr):
        np.testing.assert_allclose(x, y, rtol=5e-4, atol=1e-4)


def test_sell_split_chunked_parity():
    """Split rows + chunking together (the Products-with-hubs regime)."""
    from gatv2_tpu.data.synthetic import powerlaw_graph

    g = powerlaw_graph(900, 12000, 8, 3, seed=6, alpha=1.1)
    n = g.num_nodes
    src_all, dst_all = _coo(g)
    zs, zd, a = _rand_zza(n, 2, 16, 22)
    st3 = prepare_sell_tiles(g.row_ptr, g.col_idx, n, num_chunks=3)
    assert st3.num_chunks == 3 and st3.dst.split

    def loss_sell(zs, zd, a):
        o = sell_attention(
            zs, zd, a, None, None, n, negative_slope=0.2, sell_tiles=st3,
            interpret=True,
        )
        return jnp.sum(jnp.sin(o)), o

    (_, out), gs = jax.value_and_grad(
        loss_sell, argnums=(0, 1, 2), has_aux=True
    )(zs, zd, a)
    ref = _ref(zs, zd, a, src_all, dst_all, n)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def loss_ref(zs, zd, a):
        return jnp.sum(jnp.sin(_ref(zs, zd, a, src_all, dst_all, n)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(zs, zd, a)
    for x, y in zip(gs, gr):
        np.testing.assert_allclose(x, y, rtol=5e-4, atol=1e-4)


@pytest.mark.fast
def test_sell_via_edge_attention():
    """The impl='sell' dispatch path through ops.attention.edge_attention."""
    g = random_graph(
        num_nodes=200, num_edges=900, feature_dim=8, num_classes=3, seed=4
    )
    n = g.num_nodes
    src_all, dst_all = _coo(g)
    zs, zd, a = _rand_zza(n, 4, 16, 6)
    st = prepare_sell_tiles(g.row_ptr, g.col_idx, n)
    out = edge_attention(
        zs, zd, a, jnp.asarray(src_all), jnp.asarray(dst_all), n,
        negative_slope=0.2, impl="sell", edge_tiles=st, interpret=True,
    )
    ref = _ref(zs, zd, a, src_all, dst_all, n)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_sell_zero_edge_graph():
    """A graph with NO edges (all-isolated nodes): the minimum-size ELL
    layout (one empty TILE_N slice per side) must produce exactly-zero
    output and gradients — regression for the round-4 phase-2a rework
    (padding slots clamp onto real packets and are cnt-masked; with zero
    real edges every slot is a pad)."""
    n = 10
    row_ptr = np.zeros(n + 1, np.int64)
    col_idx = np.zeros(0, np.int32)
    st = prepare_sell_tiles(row_ptr, col_idx, n)
    zs, zd, a = _rand_zza(n, 2, 8, 0)

    def loss(zs, zd, a):
        return jnp.sum(jnp.sin(sell_attention(
            zs, zd, a, None, None, n, negative_slope=0.2, sell_tiles=st,
            interpret=True,
        )))

    v, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(
        zs, zd, a
    )
    assert float(v) == 0.0
    for g_ in grads:
        np.testing.assert_array_equal(np.asarray(g_), 0.0)


def test_sell_chunked_low_mem_parity(monkeypatch):
    """The LOW-MEM chunked row-operand strategy (per-chunk gathers inside
    the scan body — what products-full scale selects) matches the fast
    pre-permuted strategy and the oracle. Small graphs pick the fast
    path by the memory condition, so force low-mem here."""
    import gatv2_tpu.ops.sell_attention as sa

    g = random_graph(
        num_nodes=700, num_edges=3200, feature_dim=8, num_classes=3, seed=13
    )
    n = g.num_nodes
    src_all, dst_all = _coo(g)
    zs, zd, a = _rand_zza(n, 2, 32, 8)
    st3 = prepare_sell_tiles(g.row_ptr, g.col_idx, n, num_chunks=3)

    def loss(zs, zd, a):
        o = sell_attention(
            zs, zd, a, None, None, n, negative_slope=0.2,
            sell_tiles=st3, interpret=True,
        )
        return jnp.sum(jnp.sin(o)), o

    (v_fast, o_fast), g_fast = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True
    )(zs, zd, a)
    assert not sa._chunk_rows_low_mem_for(st3, 64)
    monkeypatch.setattr(sa, "_chunk_rows_low_mem_for", lambda st, hd: True)
    (v_lm, o_lm), g_lm = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True
    )(zs, zd, a)
    np.testing.assert_allclose(o_lm, o_fast, rtol=1e-6, atol=1e-6)
    ref = _ref(zs, zd, a, src_all, dst_all, n)
    np.testing.assert_allclose(o_lm, ref, rtol=2e-5, atol=2e-5)
    for xl, xf in zip(g_lm, g_fast):
        np.testing.assert_allclose(xl, xf, rtol=1e-5, atol=1e-6)


def test_sell_bf16_streams_parity():
    """streams='bf16' equals THE EXACT KERNELS RUN ON bf16-ROUNDED
    PROJECTIONS — the tier's contract: zs/zd round once (and are stored
    bf16 as residuals), every kernel computes f32 from the same rounded
    values; g/sigma/r stay exact f32. The forward additionally matches
    the rounded-input ORACLE tightly; gradients are compared against the
    exact-path-at-rounded-inputs reference (the oracle's autodiff differs
    there on ties: bf16 rounding makes exact zs = -zd cancellations
    likely, and at s == 0 jax.nn.leaky_relu's derivative takes 1.0 where
    the kernels' s > 0 branch takes the slope — a measure-zero boundary
    in f32 that rounding exposes, not a defect). Both chunk modes are
    covered."""
    g = random_graph(
        num_nodes=700, num_edges=3200, feature_dim=8, num_classes=3, seed=13
    )
    n = g.num_nodes
    src_all, dst_all = _coo(g)
    zs, zd, a = _rand_zza(n, 2, 32, 8)
    zs_r = zs.astype(jnp.bfloat16).astype(jnp.float32)
    zd_r = zd.astype(jnp.bfloat16).astype(jnp.float32)
    ref_out = _ref(zs_r, zd_r, a, src_all, dst_all, n)

    for chunks in (1, 3):
        st = prepare_sell_tiles(g.row_ptr, g.col_idx, n, num_chunks=chunks)

        def mk(streams):
            def loss(zs_, zd_, a_):
                o = sell_attention(
                    zs_, zd_, a_, None, None, n, negative_slope=0.2,
                    sell_tiles=st, interpret=True, streams=streams,
                )
                return jnp.sum(jnp.sin(o)), o

            return loss

        (_, o), gr = jax.value_and_grad(
            mk("bf16"), argnums=(0, 1, 2), has_aux=True
        )(zs, zd, a)
        (_, o_ex), gr_ex = jax.value_and_grad(
            mk("f32"), argnums=(0, 1, 2), has_aux=True
        )(zs_r, zd_r, a)
        np.testing.assert_allclose(o, ref_out, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(o, o_ex, rtol=1e-5, atol=1e-6)
        for x, y in zip(gr, gr_ex):
            # f32 transport + exact g: the only deltas are compiler
            # reassociation between the two programs (scale-relative —
            # near-zero elements make per-element rtol meaningless)
            err = np.abs(np.asarray(x) - np.asarray(y)).max()
            scale = np.abs(np.asarray(y)).max() + 1e-12
            assert err <= 1e-5 * scale, (err, scale)


def test_sell_f32_streams_unchanged():
    """streams='f32' (the default) is bit-identical to not passing the
    knob at all — the exact path carries zero cost for the tier."""
    g = random_graph(
        num_nodes=400, num_edges=1600, feature_dim=8, num_classes=3, seed=3
    )
    n = g.num_nodes
    zs, zd, a = _rand_zza(n, 2, 16, 5)
    st = prepare_sell_tiles(g.row_ptr, g.col_idx, n)
    o1 = sell_attention(
        zs, zd, a, None, None, n, negative_slope=0.2, sell_tiles=st,
        interpret=True,
    )
    o2 = sell_attention(
        zs, zd, a, None, None, n, negative_slope=0.2, sell_tiles=st,
        interpret=True, streams="f32",
    )
    assert (np.asarray(o1) == np.asarray(o2)).all()

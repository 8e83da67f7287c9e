"""ctypes bindings to the native C++ text parser (native/loader.cpp).

The reference's data layer is host C++ (`load_features` /
`load_int_array`, GATv2_edge_based.cu:24-64) — single-threaded
istringstream parsing. Our native equivalent is a multi-threaded C++
parser for the whitespace-number files, exposed via a tiny C ABI and
loaded here with ctypes. If the shared library has not been built (or
fails to load), callers fall back to numpy parsing; both paths produce
identical arrays.

Build: `make -C native` (or `python -m gatv2_tpu.utils.native_loader`).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import sys

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_LIB_PATH = _REPO_ROOT / "native" / "libgatv2_loader.so"

_lib = None
_load_attempted = False


def _get_lib():
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.parse_floats.restype = ctypes.c_longlong
        lib.parse_floats.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
        ]
        lib.parse_ints.restype = ctypes.c_longlong
        lib.parse_ints.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_longlong,
        ]
        lib.count_numbers.restype = ctypes.c_longlong
        lib.count_numbers.argtypes = [ctypes.c_char_p]
        lib.sample_batch.restype = ctypes.c_longlong
        lib.sample_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int64),  # row_ptr
            ctypes.POINTER(ctypes.c_int32),  # col_idx
            ctypes.c_longlong,  # graph_nodes
            ctypes.POINTER(ctypes.c_int32),  # seeds
            ctypes.c_longlong,  # num_seeds
            ctypes.POINTER(ctypes.c_int32),  # fanouts
            ctypes.c_int,  # num_layers
            ctypes.c_longlong,  # max_nodes
            ctypes.c_longlong,  # max_edges
            ctypes.c_uint64,  # rng_seed
            ctypes.POINTER(ctypes.c_int32),  # out_nodes
            ctypes.POINTER(ctypes.c_int32),  # out_src
            ctypes.POINTER(ctypes.c_int32),  # out_dst
            ctypes.POINTER(ctypes.c_longlong),  # out_num_edges
        ]
        lib.emit_tiles.restype = ctypes.c_longlong
        lib.emit_tiles.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # src
            ctypes.POINTER(ctypes.c_int32),  # dst
            ctypes.c_longlong,  # num_edges
            ctypes.c_longlong,  # max_nodes
            ctypes.c_longlong,  # te
            ctypes.c_longlong,  # want
            ctypes.POINTER(ctypes.c_int32),  # out_src_flat
            ctypes.POINTER(ctypes.c_int32),  # out_dst_flat
            ctypes.POINTER(ctypes.c_int32),  # out_tile_offsets
            ctypes.POINTER(ctypes.c_int32),  # out_src_sorted_ids
            ctypes.POINTER(ctypes.c_int32),  # out_gather_perm
            ctypes.POINTER(ctypes.c_int32),  # out_dst_of_src
            ctypes.POINTER(ctypes.c_int32),  # out_src_tile_offsets
        ]
        lib.emit_sell_tiles.restype = ctypes.c_longlong
        lib.emit_sell_tiles.argtypes = (
            [
                ctypes.POINTER(ctypes.c_int32),  # src
                ctypes.POINTER(ctypes.c_int32),  # dst
            ]
            + [ctypes.c_longlong] * 7  # num_edges..tiles_s
            + [ctypes.POINTER(ctypes.c_int32)] * 13  # per-side + ell_perm
        )
        lib.gather_rows_f32.restype = None
        lib.gather_rows_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # src
            ctypes.c_longlong,  # src_rows
            ctypes.c_longlong,  # row_len
            ctypes.POINTER(ctypes.c_int32),  # idx
            ctypes.c_longlong,  # k
            ctypes.POINTER(ctypes.c_float),  # out
            ctypes.c_longlong,  # out_rows
            ctypes.c_int,  # num_threads
        ]
        _lib = lib
    except (OSError, AttributeError):
        # AttributeError: a stale libgatv2_loader.so built before a newer
        # symbol existed — fall back to the numpy paths (rebuild with
        # `make -C native` to restore the fast path)
        _lib = None
    return _lib


def available() -> bool:
    return _get_lib() is not None


def build(verbose: bool = False) -> bool:
    """Compile the native loader with g++. Returns True on success."""
    native_dir = _REPO_ROOT / "native"
    try:
        subprocess.run(
            ["make", "-C", str(native_dir)],
            check=True,
            capture_output=not verbose,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _load_attempted
    _load_attempted = False
    return available()


def _parse_error(kind: str, got: int, want: int, path) -> str:
    reasons = {
        -1: "cannot read the file",
        -2: "token count changed between passes",
        -3: "token count mismatch",
        -4: f"malformed token (non-numeric text or out-of-range {kind})",
    }
    why = reasons.get(got, f"parsed {got}/{want} {kind}")
    return f"native loader: {path}: {why}"


def parse_float_file(path: os.PathLike) -> np.ndarray | None:
    """Parse a whitespace-float file. None if native lib unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    p = str(path).encode()
    n = lib.count_numbers(p)
    if n < 0:
        raise IOError(f"native loader: cannot read {path}")
    out = np.empty(n, dtype=np.float32)
    got = lib.parse_floats(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
    )
    if got != n:
        raise IOError(_parse_error("floats", got, n, path))
    return out


def parse_int_file(path: os.PathLike) -> np.ndarray | None:
    """Parse a whitespace-int file. None if native lib unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    p = str(path).encode()
    n = lib.count_numbers(p)
    if n < 0:
        raise IOError(f"native loader: cannot read {path}")
    out = np.empty(n, dtype=np.int32)
    got = lib.parse_ints(p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n)
    if got != n:
        raise IOError(_parse_error("ints", got, n, path))
    return out


def sample_batch(
    row_ptr: np.ndarray,  # [N+1] int64
    col_idx: np.ndarray,  # [E] int32
    seeds: np.ndarray,  # [S] int32
    fanouts: np.ndarray,  # [L] int32
    max_nodes: int,
    max_edges: int,
    rng_seed: int,
):
    """Native neighbor sample (native/sampler.cpp). Returns
    (nodes [max_nodes] int32, src [max_edges], dst [max_edges],
    num_nodes, num_edges) or None if the library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    col_idx = np.ascontiguousarray(col_idx, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    fanouts = np.ascontiguousarray(fanouts, np.int32)
    out_nodes = np.empty(max_nodes, np.int32)
    out_src = np.empty(max_edges, np.int32)
    out_dst = np.empty(max_edges, np.int32)
    out_num_edges = ctypes.c_longlong(0)
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    nn = lib.sample_batch(
        row_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        i32p(col_idx),
        len(row_ptr) - 1,
        i32p(seeds),
        len(seeds),
        i32p(fanouts),
        len(fanouts),
        max_nodes,
        max_edges,
        rng_seed,
        i32p(out_nodes),
        i32p(out_src),
        i32p(out_dst),
        ctypes.byref(out_num_edges),
    )
    if nn < 0:
        raise ValueError("native sampler: invalid arguments")
    return out_nodes, out_src, out_dst, int(nn), int(out_num_edges.value)


def emit_tiles(
    src: np.ndarray,  # [>=num_edges] int32, local ids
    dst: np.ndarray,  # [>=num_edges] int32, dst-sorted
    num_edges: int,
    max_nodes: int,  # multiple of 128
    te: int,
    fixed_edge_tiles: int,
):
    """Native fixed-budget tile emission (native/sampler.cpp emit_tiles) —
    byte-identical to prepare_edge_tiles(..., fixed_edge_tiles, num_chunks=1)
    flat layouts. Returns a dict of arrays or None if the library is
    unavailable. Raises ValueError when the fixed budget does not fit."""
    lib = _get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    want = fixed_edge_tiles * te
    num_tiles = max_nodes // 128
    out = {
        "src": np.empty(want, np.int32),
        "dst": np.empty(want, np.int32),
        "tile_offsets": np.empty(num_tiles + 1, np.int32),
        "src_sorted_ids": np.empty(want, np.int32),
        "gather_perm": np.empty(want, np.int32),
        "dst_of_src": np.empty(want, np.int32),
        "src_tile_offsets": np.empty(num_tiles + 1, np.int32),
    }
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.emit_tiles(
        i32p(src), i32p(dst), num_edges, max_nodes, te, want,
        i32p(out["src"]), i32p(out["dst"]), i32p(out["tile_offsets"]),
        i32p(out["src_sorted_ids"]), i32p(out["gather_perm"]),
        i32p(out["dst_of_src"]), i32p(out["src_tile_offsets"]),
    )
    if rc != 0:
        raise ValueError(
            f"native emit_tiles: fixed budget {fixed_edge_tiles} tiles x "
            f"te={te} does not fit (or bad inputs: {num_edges} edges, "
            f"{max_nodes} nodes)"
        )
    return out


def emit_sell_tiles(
    src: np.ndarray,  # [>=num_edges] int32, local ids
    dst: np.ndarray,  # [>=num_edges] int32, dst-sorted
    num_edges: int,
    max_nodes: int,
    split_cap: int,
    fixed: tuple[int, int, int, int],  # (cols_d, cols_s, tiles_d, tiles_s)
):
    """Native fixed-geometry SELL layout emission (native/sampler.cpp
    emit_sell_tiles) — byte-identical to
    ops.sell_attention.prepare_minibatch_sell_tiles. Returns a dict of
    numpy arrays or None if the library is unavailable (or predates the
    symbol). Raises ValueError when the fixed geometry does not fit."""
    lib = _get_lib()
    if lib is None or not hasattr(lib, "emit_sell_tiles"):
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    cols_d, cols_s, tiles_d, tiles_s = fixed
    out = {
        "perm_d": np.empty(tiles_d * 128, np.int32),
        "vsort_d": np.empty(tiles_d * 128, np.int32),
        "sids_d": np.empty(tiles_d * 128, np.int32),
        "gather_d": np.empty(cols_d * 128, np.int32),
        "cnt_d": np.empty(cols_d, np.int32),
        "col_off_d": np.empty(tiles_d + 1, np.int32),
        "perm_s": np.empty(tiles_s * 128, np.int32),
        "vsort_s": np.empty(tiles_s * 128, np.int32),
        "sids_s": np.empty(tiles_s * 128, np.int32),
        "gather_s": np.empty(cols_s * 128, np.int32),
        "cnt_s": np.empty(cols_s, np.int32),
        "col_off_s": np.empty(tiles_s + 1, np.int32),
        "ell_perm": np.empty(cols_s * 128, np.int32),
    }
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.emit_sell_tiles(
        i32p(src), i32p(dst), num_edges, max_nodes, split_cap,
        cols_d, cols_s, tiles_d, tiles_s,
        *(i32p(out[k]) for k in (
            "perm_d", "vsort_d", "sids_d", "gather_d", "cnt_d", "col_off_d",
            "perm_s", "vsort_s", "sids_s", "gather_s", "cnt_s", "col_off_s",
            "ell_perm",
        )),
    )
    if rc != 0:
        raise ValueError(
            f"native emit_sell_tiles: fixed geometry {fixed} does not fit "
            f"(or bad inputs: {num_edges} edges, {max_nodes} nodes)"
        )
    return out


def gather_rows(
    src: np.ndarray,  # [R, F] float32 (C-contiguous)
    idx: np.ndarray,  # [k] int32
    out_rows: int,
    *,
    num_threads: int = 8,
):
    """Parallel out[i] = src[idx[i]] (rows >= len(idx) zeroed). None if the
    native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int32)
    out = np.empty((out_rows, src.shape[1]), np.float32)
    lib.gather_rows_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.shape[0],
        src.shape[1],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(idx),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_rows,
        num_threads,
    )
    return out


if __name__ == "__main__":
    ok = build(verbose=True)
    print(f"native loader built: {ok}", file=sys.stderr)
    sys.exit(0 if ok else 1)

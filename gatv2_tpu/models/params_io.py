"""Parameter layout conversions + text weight dump/restore.

The two reference programs store attention weights differently:
  - edge variant: ONE fused matrix per (layer, head), W in [out, 2*in] —
    left half multiplies x_src, right half x_dst
    (GATv2_edge_based.cu:299-320; aggregation uses only the left half,
    `w_h_left`, E:415-423);
  - node variant: split W_src, W_dst in [out, in]
    (GATv2_node_based.cu:390-406).

The math is identical; this framework stores split (models/gatv2.py) and
provides exact conversions here so fused-layout weights (the edge file's
parameterization) can be imported/exported. Also provided: whitespace-text
weight dump/restore — the counterpart of the reference's debug hooks
`save_array_to_file` / `load_float_array` (GATv2_node_based.cu:53-68,
39-49), which the reference author used to diff tensors between the two
variants by hand.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from gatv2_tpu.config import ModelConfig
from gatv2_tpu.models.gatv2 import GATv2Params


def split_to_fused(layer_params: dict) -> jnp.ndarray:
    """(w_src, w_dst) [H, D, F] each -> fused W [H, D, 2F] (edge layout)."""
    return jnp.concatenate([layer_params["w_src"], layer_params["w_dst"]], axis=-1)


def fused_to_split(w_fused: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused W [H, D, 2F] -> (w_src, w_dst) [H, D, F] each."""
    f2 = w_fused.shape[-1]
    if f2 % 2:
        raise ValueError(f"fused W last dim must be even, got {f2}")
    return w_fused[..., : f2 // 2], w_fused[..., f2 // 2 :]


def params_to_fused(params: GATv2Params) -> dict:
    """Whole-model split params -> fused-layout pytree
    {'layers': ({'w': [H,D,2F], 'a': [H,D]}, ...), 'w_o': [C, D_L]}."""
    layers = tuple(
        {"w": split_to_fused(lp), "a": lp["a"]} for lp in params["layers"]
    )
    return {"layers": layers, "w_o": params["w_o"]}


def params_from_fused(fused: dict) -> GATv2Params:
    """Inverse of params_to_fused."""
    layers = []
    for lp in fused["layers"]:
        w_src, w_dst = fused_to_split(lp["w"])
        layers.append({"w_src": w_src, "w_dst": w_dst, "a": lp["a"]})
    return {"layers": tuple(layers), "w_o": fused["w_o"]}


def init_params_fused(config: ModelConfig, key: jax.Array) -> GATv2Params:
    """Xavier init drawing each layer's W as ONE fused [H, D, 2F] tensor —
    element-for-element the reference edge variant's init distribution
    (xavier_init_kernel_curand fills the fused W row-contiguously with
    U(-l, l), l = sqrt(6 / (2*in + out)), GATv2_edge_based.cu:208,227-229).
    Returns split-layout params (the framework's working layout)."""
    in_dims = config.layer_in_dims
    layers = []
    for l in range(config.num_layers):
        h, d, f = config.heads[l], config.out_dims[l], in_dims[l]
        limit = float(np.sqrt(6.0 / (2 * f + d)))
        key, k1, k2 = jax.random.split(key, 3)
        w_fused = jax.random.uniform(k1, (h, d, 2 * f), jnp.float32, -limit, limit)
        w_src, w_dst = fused_to_split(w_fused)
        a = jax.random.uniform(k2, (h, d), jnp.float32, -limit, limit)
        layers.append({"w_src": w_src, "w_dst": w_dst, "a": a})
    c, d_last = config.num_classes, config.out_dims[-1]
    limit_o = float(np.sqrt(6.0 / (c + d_last)))
    key, ko = jax.random.split(key)
    w_o = jax.random.uniform(ko, (c, d_last), jnp.float32, -limit_o, limit_o)
    return {"layers": tuple(layers), "w_o": w_o}


# ---- text dump/restore (reference debug-hook format) -----------------------


def save_array_txt(path: str | pathlib.Path, arr: np.ndarray) -> None:
    """Whitespace-float dump, one value per line — byte-compatible with the
    reference's save_array_to_file (GATv2_node_based.cu:53-68)."""
    flat = np.asarray(arr, np.float32).reshape(-1)
    with open(path, "w") as f:
        for v in flat:
            f.write(f"{float(v):.9g}\n")


def load_array_txt(path: str | pathlib.Path, shape=None) -> np.ndarray:
    """Counterpart of load_float_array (GATv2_node_based.cu:39-49)."""
    flat = np.loadtxt(path, dtype=np.float32).reshape(-1)
    return flat.reshape(shape) if shape is not None else flat


def save_params_txt(directory: str | pathlib.Path, params: GATv2Params) -> None:
    """Dump every tensor as text: layer{L}_{w_src,w_dst,a}.txt + w_o.txt,
    plus fused layer{L}_w_fused.txt for cross-checking against the edge
    variant's layout."""
    d = pathlib.Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    for l, lp in enumerate(params["layers"]):
        save_array_txt(d / f"layer{l}_w_src.txt", np.asarray(lp["w_src"]))
        save_array_txt(d / f"layer{l}_w_dst.txt", np.asarray(lp["w_dst"]))
        save_array_txt(d / f"layer{l}_a.txt", np.asarray(lp["a"]))
        save_array_txt(
            d / f"layer{l}_w_fused.txt", np.asarray(split_to_fused(lp))
        )
    save_array_txt(d / "w_o.txt", np.asarray(params["w_o"]))


def load_params_txt(
    directory: str | pathlib.Path, config: ModelConfig
) -> GATv2Params:
    """Restore params dumped by save_params_txt (split tensors)."""
    d = pathlib.Path(directory)
    in_dims = config.layer_in_dims
    layers = []
    for l in range(config.num_layers):
        h, dd, f = config.heads[l], config.out_dims[l], in_dims[l]
        layers.append(
            {
                "w_src": jnp.asarray(
                    load_array_txt(d / f"layer{l}_w_src.txt", (h, dd, f))
                ),
                "w_dst": jnp.asarray(
                    load_array_txt(d / f"layer{l}_w_dst.txt", (h, dd, f))
                ),
                "a": jnp.asarray(load_array_txt(d / f"layer{l}_a.txt", (h, dd))),
            }
        )
    w_o = jnp.asarray(
        load_array_txt(d / "w_o.txt", (config.num_classes, config.out_dims[-1]))
    )
    return {"layers": tuple(layers), "w_o": w_o}

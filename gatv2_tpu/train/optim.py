"""Optimizers: SGD and Adam with the reference's exact semantics.

- Adam: bias correction uses t = epoch (1-indexed), eps = 1e-8
  (adam_update_kernel, GATv2_edge_based.cu:896-916; call sites pass the
  epoch counter, E:1575-1592).
- SGD: p -= lr * g (sgd_update_kernel, E:919-923).
- Optional global-norm clipping at a fixed threshold (5.0 at call sites,
  E:1561-1567) applied PER PARAMETER GROUP, with the reference's
  scale = clip / (norm + 1e-9) (clip_grad_norm, E:250-278). The edge
  variant clips 3 groups (fused W, a, W_o); since we store W split we clip
  W_src+W_dst as ONE group to match the fused-W norm.

These are deliberately hand-rolled (not optax) to pin the reference's
epoch-indexed bias correction and group-wise clipping; optax wrappers can
be layered on top for the minibatch path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from gatv2_tpu.config import TrainConfig

OptState = dict[str, Any]  # {"m": pytree, "v": pytree} for adam; {} for sgd

CLIP_EPS = 1e-9
ADAM_EPS = 1e-8


def init_opt_state(params: Any, optimizer: str) -> OptState:
    if optimizer == "adam":
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params)}
    if optimizer == "sgd":
        return {}
    raise ValueError(f"unknown optimizer {optimizer!r}")



def clip_by_group_norm(grads: Any, clip_norm: float) -> Any:
    """Global-L2-norm clip per parameter group (reference semantics)."""

    def scale_of(leaves: list[jax.Array]) -> jax.Array:
        sq = sum(jnp.sum(jnp.square(g)) for g in leaves)
        norm = jnp.sqrt(sq) + CLIP_EPS
        return jnp.where(norm > clip_norm, clip_norm / norm, 1.0)

    w_scale = scale_of(
        [g for l in grads["layers"] for g in (l["w_src"], l["w_dst"])]
    )
    a_scale = scale_of([l["a"] for l in grads["layers"]])
    o_scale = scale_of([grads["w_o"]])

    return {
        "layers": tuple(
            {
                "w_src": l["w_src"] * w_scale,
                "w_dst": l["w_dst"] * w_scale,
                "a": l["a"] * a_scale,
            }
            for l in grads["layers"]
        ),
        "w_o": grads["w_o"] * o_scale,
    }


def apply_updates(
    params: Any,
    grads: Any,
    opt_state: OptState,
    t: jax.Array,  # 1-indexed step/epoch counter (for Adam bias correction)
    config: TrainConfig,
) -> tuple[Any, OptState]:
    if config.clip:
        grads = clip_by_group_norm(grads, config.clip_norm)
    if config.optimizer == "sgd":
        new_params = jax.tree.map(lambda p, g: p - config.lr * g, params, grads)
        return new_params, opt_state

    b1, b2, lr = config.beta1, config.beta2, config.lr
    t = t.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(b1, t)
    bc2 = 1.0 - jnp.power(b2, t)

    def upd(p, g, m, v):
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        m_hat = m / bc1
        v_hat = v / bc2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + ADAM_EPS), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = jax.tree.leaves(grads)
    flat_m = jax.tree.leaves(opt_state["m"])
    flat_v = jax.tree.leaves(opt_state["v"])
    new_p, new_m, new_v = [], [], []
    for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
        np_, nm, nv = upd(p, g, m, v)
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)
    return (
        jax.tree.unflatten(treedef, new_p),
        {
            "m": jax.tree.unflatten(treedef, new_m),
            "v": jax.tree.unflatten(treedef, new_v),
        },
    )

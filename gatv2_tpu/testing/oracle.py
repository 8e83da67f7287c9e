"""Pure-numpy oracle: a literal, loop-level transcription of the REFERENCE
MATH (not its code) used as the golden model for parity tests.

It implements exactly what the CUDA kernels compute per edge/node
(SURVEY.md §0): the GATv2 score e_ij = a_h . LeakyReLU(W_src x_i + W_dst x_j)
(score kernels: GATv2_edge_based.cu:279-324 / GATv2_node_based.cu:351-413),
the stable per-destination softmax with `+1e-8` denominator (E:362-384),
aggregation with only the src projection (E:415-423), per-head LeakyReLU +
concat on hidden layers, last-layer head averaging in both activation orders
(edge: E:443-448; node: N:548-557), and the W_o softmax classifier + CE loss
(E:463-550).

Deliberately slow and simple — O(E) python loops — run on tiny graphs only.
"""

from __future__ import annotations

import numpy as np

SOFTMAX_EPS = 1e-8


def leaky_relu(x: np.ndarray, slope: float) -> np.ndarray:
    return np.where(x > 0, x, slope * x)


def layer_oracle(
    x: np.ndarray,  # [N, F]
    row_ptr: np.ndarray,  # [N+1]
    col_idx: np.ndarray,  # [E]
    w_src: np.ndarray,  # [H, D, F]
    w_dst: np.ndarray,  # [H, D, F]
    a: np.ndarray,  # [H, D]
    *,
    negative_slope: float,
    is_last: bool,
    variant: str,
) -> np.ndarray:
    n = x.shape[0]
    num_heads, d, _ = w_src.shape
    h_out = np.zeros((n, num_heads, d), np.float64)
    x = x.astype(np.float64)
    w_src = w_src.astype(np.float64)
    w_dst = w_dst.astype(np.float64)
    a = a.astype(np.float64)

    for j in range(n):  # destination node
        nbrs = col_idx[row_ptr[j] : row_ptr[j + 1]]
        if len(nbrs) == 0:
            continue
        for h in range(num_heads):
            zd_j = w_dst[h] @ x[j]
            scores = np.empty(len(nbrs))
            msgs = np.empty((len(nbrs), d))
            for k, i in enumerate(nbrs):  # source node
                zs_i = w_src[h] @ x[i]
                s = leaky_relu(zs_i + zd_j, negative_slope)
                scores[k] = a[h] @ s
                msgs[k] = zs_i
            m = scores.max()
            e = np.exp(scores - m)
            alpha = e / (e.sum() + SOFTMAX_EPS)
            h_out[j, h] = alpha @ msgs

    if not is_last:
        return leaky_relu(h_out, negative_slope).reshape(n, -1)
    if variant == "edge":
        return leaky_relu(h_out, negative_slope).mean(axis=1)
    return leaky_relu(h_out.mean(axis=1), negative_slope)


def model_oracle(
    features: np.ndarray,
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    layers: list[dict],
    w_o: np.ndarray,
    *,
    negative_slope: float,
    variant: str,
    return_activations: bool = False,
):
    x = features
    acts = []
    num_layers = len(layers)
    for l, p in enumerate(layers):
        x = layer_oracle(
            x,
            row_ptr,
            col_idx,
            np.asarray(p["w_src"]),
            np.asarray(p["w_dst"]),
            np.asarray(p["a"]),
            negative_slope=negative_slope,
            is_last=(l == num_layers - 1),
            variant=variant,
        )
        acts.append(x)
    logits = x @ np.asarray(w_o, np.float64).T
    if return_activations:
        return logits, acts
    return logits


def loss_and_accuracy_oracle(logits: np.ndarray, labels: np.ndarray):
    """Softmax CE + argmax accuracy over all nodes (E:463-550)."""
    z = logits - logits.max(axis=1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=1, keepdims=True)
    n = logits.shape[0]
    loss = -np.log(np.maximum(p[np.arange(n), labels], 1e-12)).mean()
    acc = (logits.argmax(axis=1) == labels).mean()
    return loss, acc

"""Fused Pallas inference kernel for the raw-IQ CNN family.

The flax forward of :class:`~amcpy_tpu.models.cnn.IQConvNet` materializes
every conv block's activations in HBM: at batch 4096 x 2048 samples the
three k=1 blocks write/read ~3.6 GB of bf16 activations per batch —
measured 7.8 ms (522k frames/s), i.e. HBM-bound at ~56% of the v5e's
819 GB/s, with the MXU nearly idle (the stack is only ~42 MFLOP/frame).

This kernel runs the whole inference trunk in ONE VMEM pass per frame
tile — raw I/Q is read from HBM exactly once and only the pooled
``(B, 2*C_out)`` features come back:

* BatchNorm is FOLDED into each conv at call time (inference identity:
  ``y = x·(W·γ/s) + (b−μ)·γ/s + β`` with ``s = sqrt(σ²+ε)``) — zero
  runtime cost, exact.
* activations live channel-major ``(C, tile_b*N)`` so every layer is a
  single wide ``(C_out, C_in) @ (C_in, tile_b*N)`` MXU matmul with the
  long time axis on the lanes; multiplies run bf16 with f32 accumulation
  exactly like the flax path (``dtype="bfloat16"``, ``param_dtype
  float32``). Measured on the v5e at batch 4096: **1.68M frames/s vs
  0.52M for ``model.apply``** under the in-program slope estimator
  (BENCH_local_r4.json; 3.2x — wall-clock including dispatch latency:
  1.05-1.09M vs 0.44M), 100% argmax agreement, logits within bf16
  accumulation tolerance (max |d| 0.017).
* the per-frame RMS normalization and the mean+max time pooling happen
  in-kernel (f32), so no ``(B, N, C)`` tensor ever exists.

Only the k=1/stride-1 stack (the family default — see ``models/cnn.py``)
is supported; wider kernels fall back to ``model.apply``. The dense head
(256→128→classes) is left to XLA — it is ~40 KFLOP/frame on a
``(B, 256)`` tensor and fuses fine.

Conformance: ``tests/test_cnn.py`` (interpret mode vs ``model.apply``)
and ``tests/tpu/test_mosaic_tpu.py`` (compiled on hardware).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fold_bn_params", "cnn_logits_fused", "supports_fused"]


def supports_fused(model) -> bool:
    """True when the architecture matches the fused kernel's contract:
    k=1/stride-1 stack AND the bf16 compute dtype the kernel hardwires —
    an f32-dtype checkpoint must keep the flax forward (its numerics
    contract is f32; the trunk's bf16 multiplies would silently degrade
    it)."""
    return (
        all(int(k) == 1 for k in model.kernel_sizes)
        and all(int(s) == 1 for s in model.strides)
        and len(model.channels) >= 1
        and str(model.dtype) in ("bfloat16", "bf16")
    )


def fold_bn_params(model, variables) -> dict:
    """Fold each BatchNorm into its preceding conv (inference identity).

    Returns ``{"convs": [(w_t, b)], "dense": [...]}`` where ``w_t`` is
    the TRANSPOSED folded weight ``(C_out, C_in)`` (the kernel's
    channel-major matmul layout) and ``b`` is ``(C_out, 1)``.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    convs = []
    for li in range(len(model.channels)):
        conv = params[f"Conv_{li}"]
        bn = params[f"BatchNorm_{li}"]
        bs = stats[f"BatchNorm_{li}"]
        w = jnp.asarray(conv["kernel"], jnp.float32)  # (1, Cin, Cout)
        assert w.shape[0] == 1, "fused path is k=1 only"
        w = w[0]  # (Cin, Cout)
        b = (
            jnp.asarray(conv["bias"], jnp.float32)
            if "bias" in conv
            else jnp.zeros((w.shape[1],), jnp.float32)
        )
        gamma = jnp.asarray(bn["scale"], jnp.float32)
        beta = jnp.asarray(bn["bias"], jnp.float32)
        mu = jnp.asarray(bs["mean"], jnp.float32)
        var = jnp.asarray(bs["var"], jnp.float32)
        s = gamma * jax.lax.rsqrt(var + 1e-5)  # model BN epsilon
        convs.append(
            (
                (w * s[None, :]).T,  # (Cout, Cin)
                (((b - mu) * s + beta)[:, None]),  # (Cout, 1)
            )
        )
    dense = [
        (
            jnp.asarray(params["Dense_0"]["kernel"], jnp.float32),
            jnp.asarray(params["Dense_0"]["bias"], jnp.float32),
        ),
        (
            jnp.asarray(params["Dense_1"]["kernel"], jnp.float32),
            jnp.asarray(params["Dense_1"]["bias"], jnp.float32),
        ),
    ]
    return {"convs": convs, "dense": dense}


def _trunk_kernel(i_ref, q_ref, *refs, tile_b, n, n_layers):
    """Per-tile trunk: RMS-norm -> k=1 conv stack -> mean+max pooling.

    ``refs`` = [w_0, b_0, ..., w_{L-1}, b_{L-1}, out]; weights are
    channel-major ``(Cout, Cin)``. All ``tile_b`` frames are laid
    side-by-side on the LANE axis — ``(C, tile_b*N)`` — so each layer is
    ONE wide MXU matmul instead of ``tile_b`` skinny ones. Measured
    (v5e, batch 4096 x 2048): 1.02-1.09M frames/s at tile_b 8-16, tying
    the per-frame variant — the trunk is VPU-bound on the relu/bias
    streams at this size, so the matmul shape no longer matters; both
    sit ~2.4x above the flax forward's 0.44M.
    """
    out_ref = refs[-1]
    wbs = [(refs[2 * k][:], refs[2 * k + 1][:]) for k in range(n_layers)]
    i = i_ref[:]  # (tile_b, N) f32
    q = q_ref[:]
    # per-frame RMS over both planes (matches models/cnn.py)
    ssq = jnp.sum(i * i + q * q, axis=-1, keepdims=True)  # (tile_b, 1)
    inv = jax.lax.rsqrt(ssq / (2.0 * n) + 1e-12)
    c_out = wbs[-1][0].shape[0]
    ni = int(n)
    # layer 0 consumes the two planes directly (Cin = 2): an MXU matmul
    # at K=2 is all padding, so run it on the VPU as two broadcast FMAs
    # per output channel, frame by frame, concatenated on the lane axis
    w0, b0 = wbs[0]
    parts = []
    for f in range(tile_b):
        i_f = i[f : f + 1, :] * inv[f, 0]  # (1, N)
        q_f = q[f : f + 1, :] * inv[f, 0]
        parts.append(w0[:, 0:1] * i_f + w0[:, 1:2] * q_f)
    h = jnp.maximum(jnp.concatenate(parts, axis=-1) + b0, 0.0)
    for w, b in wbs[1:]:
        acc = jax.lax.dot_general(
            w.astype(jnp.bfloat16),
            h.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Cout, tile_b*N)
        h = jnp.maximum(acc + b, 0.0)
    for f in range(tile_b):
        h_f = h[:, f * ni : (f + 1) * ni]
        out_ref[f : f + 1, 0:c_out] = jnp.mean(h_f, axis=-1).reshape(1, -1)
        out_ref[f : f + 1, c_out : 2 * c_out] = jnp.max(
            h_f, axis=-1
        ).reshape(1, -1)


@partial(jax.jit, static_argnames=("model", "tile_b", "interpret"))
def cnn_logits_fused(
    model,
    variables,
    iq: jax.Array,
    *,
    tile_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Logits for planar ``(B, 2, N)`` frames via the fused trunk kernel.

    Numerics match ``model.apply(..., train=False)`` up to bf16
    accumulation-order differences (tested: identical argmax, logits
    within bf16 tolerance).
    """
    if not supports_fused(model):  # pragma: no cover - guarded by caller
        raise ValueError("fused CNN inference requires k=1/stride-1 stack")
    tile_b = max(8, tile_b)  # f32 min sublane tile is 8
    folded = fold_bn_params(model, variables)
    b, two, n = iq.shape
    assert two == 2
    i = iq[:, 0, :].astype(jnp.float32)
    q = iq[:, 1, :].astype(jnp.float32)
    pad = (-b) % tile_b
    if pad:
        i = jnp.concatenate([i, jnp.repeat(i[-1:], pad, axis=0)])
        q = jnp.concatenate([q, jnp.repeat(q[-1:], pad, axis=0)])
    bp = b + pad
    c_out = folded["convs"][-1][0].shape[0]
    n_layers = len(folded["convs"])

    wb_flat = []
    wb_specs = []
    for w, bias in folded["convs"]:
        wb_flat += [w, bias]
        wb_specs += [
            pl.BlockSpec(w.shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                bias.shape, lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
    pooled = pl.pallas_call(
        partial(
            _trunk_kernel, tile_b=tile_b, n=float(n), n_layers=n_layers
        ),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec(
                (tile_b, n), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_b, n), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            *wb_specs,
        ],
        out_specs=pl.BlockSpec(
            (tile_b, 2 * c_out), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, 2 * c_out), jnp.float32),
        interpret=interpret,
    )(i, q, *wb_flat)[:b]

    # dense head in XLA, same dtypes as the flax model (bf16 hidden,
    # f32 logits)
    (w_h, b_h), (w_o, b_o) = folded["dense"]
    h = jnp.maximum(
        jnp.dot(
            pooled.astype(jnp.bfloat16),
            w_h.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + b_h,
        0.0,
    )
    # the flax head's hidden activations are bf16 before the f32 logits
    # layer — round-trip through bf16 to match that quantization point
    h = h.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.dot(h, w_o, preferred_element_type=jnp.float32) + b_o

"""Sequence-parallel feature extraction (explicit shard_map + collectives).

For frames longer than one device can (or should) hold, the sample axis is
sharded over the mesh ``seq`` axis and the extractor runs as a shard_map
kernel with explicit collectives — the TPU-native realization of the
"long-context" scaling row in SURVEY.md section 5:

* every per-frame reduction (moments, stds, kurtosis) becomes a
  shard-local partial sum + ``psum`` over ``seq``;
* the instantaneous-frequency first difference needs exactly ONE boundary
  sample from the next shard — a 1-hop ``ppermute`` halo exchange (the
  overlap-save pattern degenerated to halo=1);
* phase unwrap never materializes: wrapped first differences are computed
  per shard, so no sequential dependency crosses shard boundaries;
* only gamma_max genuinely needs the whole frame (global FFT); the frame
  is re-assembled per shard with a tiled ``all_gather`` over ``seq``.

Numerics are identical to the batched extractor (same assembly helper).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from amcpy_tpu.ops.features import _assemble_features

__all__ = ["extract_features_sp"]

_PI = np.pi
_TWO_PI = 2.0 * np.pi


def _wrap(d: jax.Array) -> jax.Array:
    w = jnp.mod(d + _PI, _TWO_PI) - _PI
    return jnp.where((w == -_PI) & (d > 0), _PI, w)


def extract_features_sp(
    iq: jax.Array,
    mesh: Mesh,
    *,
    data_axis: str | None = None,
    seq_axis: str | None = None,
    normalize_scale: bool = True,
    gmax_mode: str = "matmul",
) -> jax.Array:
    """Extract all 18 features from ``(B, 2, N)`` planar frames whose
    sample axis is sharded over the mesh's ``seq`` axis.

    Returns ``(B, 18)`` sharded over ``data`` only.
    """
    data_axis = data_axis or mesh.axis_names[0]
    seq_axis = seq_axis or mesh.axis_names[-1]
    n_seq = mesh.shape[seq_axis]
    n_total = iq.shape[-1]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(data_axis, None, seq_axis),
        out_specs=P(data_axis),
        # outputs ARE replicated over seq (every stat ends in a psum/pmax/
        # all_gather) but the varying-manual-axes inference can't prove it
        # through the axis_index-dependent halo mask
        check_vma=False,
    )
    def kernel(iq_local: jax.Array) -> jax.Array:
        i = iq_local[:, 0, :]
        q = iq_local[:, 1, :]
        n_loc = i.shape[-1]
        sidx = jax.lax.axis_index(seq_axis)

        def gmean(v):  # global mean over the sample axis
            return jax.lax.psum(jnp.sum(v, axis=-1), seq_axis) / n_total

        def gstd1(v):  # global std over all n_total samples, ddof=1
            m = gmean(v)
            c = v - m[..., None]
            return jnp.sqrt(
                jax.lax.psum(jnp.sum(jnp.square(c), axis=-1), seq_axis)
                / (n_total - 1)
            )

        # ---- amplitude / phase streams -------------------------------
        a2 = i * i + q * q
        a = jnp.sqrt(a2)
        phase = jnp.arctan2(q, i)
        abs_phase = jnp.abs(phase)

        mean_a = gmean(a)
        cn = a / mean_a[..., None] - 1.0
        abs_cn = jnp.abs(cn)

        # ---- instantaneous frequency with 1-sample halo exchange ------
        d_in = phase[..., 1:] - phase[..., :-1]
        # next shard's first column -> this shard (shard k+1 sends to k)
        perm = [(k + 1, k) for k in range(n_seq - 1)]
        recv_first = jax.lax.ppermute(phase[..., :1], seq_axis, perm)
        d_bound = recv_first - phase[..., -1:]
        w = _wrap(jnp.concatenate([d_in, d_bound], axis=-1)) / _TWO_PI
        # boundary entry is invalid on the LAST seq shard only
        valid_last = (sidx < n_seq - 1).astype(w.dtype)
        mask = jnp.concatenate(
            [jnp.ones((n_loc - 1,), w.dtype), valid_last[None]], axis=0
        )
        w = w * mask  # zero the invalid tail entry
        n_freq = n_total - 1

        def fgmean(v):
            return jax.lax.psum(jnp.sum(v * mask, axis=-1), seq_axis) / n_freq

        def fmoment(v, mu, p):
            c = (v - mu[..., None]) * mask
            return jax.lax.psum(jnp.sum(c**p, axis=-1), seq_axis) / n_freq

        f_mu = fgmean(w)
        f_m2 = fmoment(w, f_mu, 2)
        f_m4 = fmoment(w, f_mu, 4)
        f5 = jnp.sqrt(f_m2 * n_freq / (n_freq - 1))
        f9 = f_m4 / jnp.square(f_m2)

        # ---- simple stats --------------------------------------------
        f2 = gstd1(abs_phase)
        f3 = gstd1(phase)
        f4 = gstd1(abs_cn)
        f6 = mean_a
        f7 = jnp.sqrt(jax.lax.psum(jnp.sum(a, axis=-1), seq_axis)) / n_total

        cn_mu = gmean(cn)
        cn_c = cn - cn_mu[..., None]
        cn_m2 = gmean(jnp.square(cn_c))
        cn_m4 = gmean(jnp.square(jnp.square(cn_c)))
        f8 = cn_m4 / jnp.square(cn_m2)

        # ---- scale normalization -------------------------------------
        if normalize_scale:
            s = jax.lax.pmax(jnp.max(a, axis=-1), seq_axis)
            s = jnp.where(s > 0, s, jnp.ones_like(s))
            inv = (1.0 / s)[..., None]
            iu, qu, a2n = i * inv, q * inv, a2 * jnp.square(inv)
        else:
            s = None
            iu, qu, a2n = i, q, a2

        # ---- moments (global means via psum) -------------------------
        x2r = iu * iu - qu * qu
        x2i = 2.0 * iu * qu
        x4r = x2r * x2r - x2i * x2i
        x4i = 2.0 * x2r * x2i
        x6r = x4r * x2r - x4i * x2i
        x6i = x4r * x2i + x4i * x2r
        a4 = a2n * a2n
        moments = {
            "m20": jax.lax.complex(gmean(x2r), gmean(x2i)),
            "m21": gmean(a2n),
            "m40": jax.lax.complex(gmean(x4r), gmean(x4i)),
            "m41": jax.lax.complex(gmean(x2r * a2n), gmean(x2i * a2n)),
            "m42": gmean(a4),
            "m60": jax.lax.complex(gmean(x6r), gmean(x6i)),
            "m61": jax.lax.complex(gmean(x4r * a2n), gmean(x4i * a2n)),
            "m62": gmean(x2r * a4),
            "m63": gmean(a2n * a4),
        }

        # ---- gamma_max: distributed two-stage matmul-DFT ----------------
        # Raw i/q (not iu/qu): the DFT is linear, so the s^2-rescale round
        # trip is pure overhead — see ops/features.py for the f32 bound.
        #
        # TPU-native shape (VERDICT r2 item 4): with N = N1 x N2 and the
        # contiguous shard s holding rows n1 in [s*r, (s+1)*r) of the
        # (N1, N2) sample matrix (r = N1/n_seq), stage 1's contraction
        # over n1 decomposes into shard-local partial matmuls +
        # ``psum_scatter`` over the OUTPUT rows k1 — each shard then owns
        # r rows of the stage-1 result and finishes twiddle + stage 2 +
        # max locally, with a scalar ``pmax`` at the end. Per-device ICI
        # traffic is the scattered (B, r, N2) block (~1/n_seq of the
        # frame) instead of the full-frame all_gather, and each shard does
        # 1/n_seq of the MXU work instead of redundantly computing the
        # whole DFT.
        from amcpy_tpu.ops import fft as _fft

        # prefer a factorization whose N1 is a multiple of the seq-axis
        # size — only then can the distributed two-stage DFT run (each
        # shard owns whole stage-1 row blocks). Round 3 required it of
        # the DEFAULT factorization, silently all-gathering whenever
        # n1 % n_seq != 0 — e.g. every seq>8 mesh at N=2048 (VERDICT r3
        # item 9); now any valid divisible factorization is found first.
        fac = (
            _fft.best_factorization(n_total, multiple_of=n_seq)
            if gmax_mode == "matmul"
            else None
        )
        if fac is not None and n_loc > 1:
            n1, n2 = fac
            r = n1 // n_seq
            w1r, w1i, twr, twi, w2r, w2i = (
                jnp.asarray(t) for t in _fft._dft_tables(n1, n2)
            )
            b = i.shape[0]
            ar = i.reshape(b, r, n2)  # local rows j -> global n1 = s*r + j
            ai = q.reshape(b, r, n2)
            w1r_s = jax.lax.dynamic_slice(w1r, (0, sidx * r), (n1, r))
            w1i_s = jax.lax.dynamic_slice(w1i, (0, sidx * r), (n1, r))

            def dot(w, x):  # (N1, r) x (b, r, N2) -> (b, N1, N2)
                return jnp.einsum(
                    "kj,bjm->bkm", w, x,
                    preferred_element_type=jnp.float32,
                )

            cr = dot(w1r_s, ar) - dot(w1i_s, ai)
            ci = dot(w1r_s, ai) + dot(w1i_s, ar)
            # reduce over shards, scattering the k1 rows: shard s keeps
            # k1 in [s*r, (s+1)*r)
            cr = jax.lax.psum_scatter(
                cr, seq_axis, scatter_dimension=1, tiled=True
            )
            ci = jax.lax.psum_scatter(
                ci, seq_axis, scatter_dimension=1, tiled=True
            )
            twr_s = jax.lax.dynamic_slice(twr, (sidx * r, 0), (r, n2))
            twi_s = jax.lax.dynamic_slice(twi, (sidx * r, 0), (r, n2))
            dr = cr * twr_s - ci * twi_s
            di = cr * twi_s + ci * twr_s

            def dot2(x, w):  # (b, r, N2) x (N2, N2) -> (b, r, N2)
                return jnp.einsum(
                    "brm,ml->brl", x, w,
                    preferred_element_type=jnp.float32,
                )

            xr = dot2(dr, w2r) - dot2(di, w2i)
            xi = dot2(dr, w2i) + dot2(di, w2r)
            power = xr * xr + xi * xi
            f1 = (
                jax.lax.pmax(
                    jnp.max(power.reshape(b, r * n2), axis=-1), seq_axis
                )
                / n_total
            )
        else:
            # fallback (fft mode / non-factorizable N): reassemble the
            # frame per shard and run the local spectral kernel
            i_full = jax.lax.all_gather(i, seq_axis, axis=-1, tiled=True)
            q_full = jax.lax.all_gather(q, seq_axis, axis=-1, tiled=True)
            if gmax_mode == "matmul":
                f1 = _fft.gmax_matmul(i_full, q_full)
            else:
                f1 = _fft.gmax_fft(i_full, q_full)

        return _assemble_features(
            (f1, f2, f3, f4, f5, f6, f7, f8, f9), moments, s
        ).astype(i.dtype)

    try:
        # Private but the only way to detect "already inside an outer jit
        # trace" (e.g. AOT lowering for the collective audit), where
        # set_mesh is illegal and unnecessary — the shard_map carries its
        # mesh explicitly. Guarded: if the symbol moves in a future JAX,
        # fall back to treating the trace state as clean.
        from jax._src.core import trace_state_clean as _tsc
    except ImportError:  # pragma: no cover - depends on JAX version
        _tsc = None
    if _tsc is not None and not _tsc():
        return kernel(iq)
    with jax.set_mesh(mesh):
        return jax.jit(kernel)(iq)

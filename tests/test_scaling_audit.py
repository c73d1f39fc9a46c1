"""Communication invariants of the sharded product programs.

These pin what XLA puts on the wire (see ``amcpy_tpu/parallel/audit.py``
and ``SCALING.md``): the throughput path must stay collective-free under
pure data sharding, and DP training must move only gradient-sized bytes.
A regression here is a scaling-efficiency regression even if every
numeric test still passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from amcpy_tpu.ops.features import extract_features_planar
from amcpy_tpu.parallel.audit import audit_collectives, collective_bytes
from amcpy_tpu.parallel.mesh import make_mesh
from amcpy_tpu.parallel.sp import extract_features_sp

B, N = 64, 256


def _hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def test_audit_parses_known_hlo():
    mesh = make_mesh(shape=(8, 1))

    def f(x):
        return jax.lax.with_sharding_constraint(
            jnp.sum(x, axis=0, keepdims=True) + 0.0 * x,
            NamedSharding(mesh, P()),
        )

    x = jax.ShapeDtypeStruct((8, 4), jnp.float32,
                             sharding=NamedSharding(mesh, P("data")))
    audit = audit_collectives(_hlo(f, x))
    assert audit, "expected at least one collective in a cross-shard sum"


def test_audit_counts_root_instructions():
    """A collective at a computation ROOT must still be counted
    (ADVICE r2 item 2)."""
    hlo = (
        "  %a = f32[8,4] all-reduce(f32[8,4] %x), replica_groups={}\n"
        "  ROOT %b = f32[8,4] all-reduce(f32[8,4] %a), replica_groups={}\n"
    )
    audit = audit_collectives(hlo)
    assert audit["all-reduce"]["count"] == 2
    assert audit["all-reduce"]["bytes"] == 2 * 8 * 4 * 4


def test_audit_start_counts_result_only():
    """Async '-start' outputs are (operand, result) tuples; only the
    result buffer is new traffic (ADVICE r2 item 3)."""
    hlo = (
        "  %ag = (f32[1,4], f32[8,4]) all-gather-start(f32[1,4] %x), "
        "dimensions={0}\n"
        "  ROOT %d = f32[8,4] all-gather-done((f32[1,4], f32[8,4]) %ag)\n"
    )
    audit = audit_collectives(hlo)
    assert audit["all-gather"]["count"] == 1
    assert audit["all-gather"]["bytes"] == 8 * 4 * 4  # result only


def test_data_sharded_extraction_is_collective_free():
    """The PRODUCT route (extraction._kernel_fn) must stay partition-local
    for every gmax mode. Raw `extract_features_planar` under the SPMD
    partitioner is only guaranteed collective-free in matmul mode — XLA
    all-gathers the batch for a sharded FFT op, which is why _kernel_fn
    shard_map-wraps the xla kernel on multi-device meshes."""
    from amcpy_tpu.extraction import _kernel_fn

    mesh = make_mesh(shape=(8, 1))
    iq = jax.ShapeDtypeStruct((B, 2, N), jnp.float32,
                              sharding=NamedSharding(mesh, P("data")))
    for gmax_mode in ("matmul", "fft"):
        kern, seq_sharded, _ = _kernel_fn(mesh, "xla", True, gmax_mode)
        assert not seq_sharded
        audit = audit_collectives(_hlo(kern, iq))
        assert audit == {}, (
            f"data-sharded extraction ({gmax_mode}) must lower to zero "
            f"cross-device collectives, got {audit}"
        )
    # the direct (non-shard_map) program is also collective-free in the
    # default matmul mode
    audit = audit_collectives(_hlo(
        lambda x: extract_features_planar(x, gmax_mode="matmul"), iq))
    assert audit == {}, audit


@pytest.mark.parametrize("shape", [(4, 2), (2, 4), (1, 8)])
def test_sp_extraction_collectives_are_bounded(shape):
    """The SP gamma_max is a DISTRIBUTED two-stage DFT (VERDICT r2 item
    4): shard-local stage-1 partial matmuls, ``psum_scatter`` over the
    stage-1 output rows, shard-local twiddle/stage-2/max, scalar pmax.
    No full-frame all_gather may appear, and total traffic is the
    scattered stage-1 block (~1/n_seq of the frame per device) + O(B)
    stat psums + the 1-sample halo — ~2x (at n_seq=2) to ~6x (at
    n_seq=8) below the round-2 all_gather budget."""
    mesh = make_mesh(shape=shape)
    d_data, _ = shape
    iq = jax.ShapeDtypeStruct(
        (B, 2, N), jnp.float32,
        sharding=NamedSharding(mesh, P("data", None, "seq")))
    hlo = _hlo(lambda x: extract_features_sp(x, mesh), iq)
    audit = audit_collectives(hlo)
    assert "all-gather" not in audit, (
        f"SP gamma_max must not re-assemble the frame: {audit}"
    )
    assert "reduce-scatter" in audit and "all-reduce" in audit
    # scattered stage-1 block: 2 planes x B_local x (N / n_seq) x 4B
    n_seq = 8 // d_data
    scatter_bytes = 2 * (B // d_data) * (N // n_seq) * 4
    budget = scatter_bytes + 40 * B * 4 + 4096
    assert collective_bytes(hlo) < budget, (
        f"unexpected SP traffic {collective_bytes(hlo)} >= {budget}: {audit}"
    )


def test_dp_training_step_moves_only_gradient_bytes():
    import optax

    from amcpy_tpu.models.classifier import AMCClassifier

    n_feat, n_classes, bt = 6, 6, 128
    model = AMCClassifier(n_classes=n_classes, hidden_sizes=(26, 29, 30))
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, n_feat), jnp.float32), train=False)
    tx = optax.rmsprop(1e-3, decay=0.99, eps=1e-8, eps_in_sqrt=False)
    opt_state = tx.init(variables["params"])
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))

    from jax.sharding import AxisType
    mesh = jax.make_mesh((8, 1), ("data", "seq"),
                         axis_types=(AxisType.Auto, AxisType.Auto))
    repl = NamedSharding(mesh, P())

    def train_step(params, batch_stats, opt_state, xb, yb, key):
        def loss_fn(p, bs):
            logits, upd = model.apply(
                {"params": p, "batch_stats": bs}, xb, train=True,
                mutable=["batch_stats"], rngs={"dropout": key})
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, yb)
            ), upd["batch_stats"]

        (loss, bs2), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats)
        updates, opt2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs2, opt2, loss

    spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=repl),
        (variables["params"], variables["batch_stats"], opt_state))
    xb = jax.ShapeDtypeStruct((bt, n_feat), jnp.float32,
                              sharding=NamedSharding(mesh, P("data")))
    yb = jax.ShapeDtypeStruct((bt,), jnp.int32,
                              sharding=NamedSharding(mesh, P("data")))
    k = jax.random.key(0)
    key = jax.ShapeDtypeStruct(k.shape, k.dtype, sharding=repl)
    hlo = _hlo(train_step, spec[0], spec[1], spec[2], xb, yb, key)
    total = collective_bytes(hlo)
    # grads (+ batch-stats means/vars + loss scalars), all O(n_params):
    budget = 8 * n_params * 4
    assert 0 < total < budget, (
        f"DP step moved {total} bytes (budget {budget}); "
        f"{audit_collectives(hlo)}"
    )

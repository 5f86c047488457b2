"""Mesh-composable Pallas kernels (round-4 verdict item 5) and the collective
structure of the sharded train step (item 6).

All on the 8-virtual-CPU-device mesh from conftest; kernels run in interpret
mode (the TPU PRNG path is hardware-only, so sampling parity uses explicit
gumbel noise, which is exact)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from open_muse_tpu.parallel.kernel_mesh import kernel_mesh, current_kernel_mesh
from open_muse_tpu.parallel.mesh import create_mesh
from open_muse_tpu.ops.pallas.vq_argmin import vq_argmin
from open_muse_tpu.ops.pallas.fused_sample import (fused_categorical,
                                                   fused_categorical_cfg)
from open_muse_tpu.ops.vq import compute_distances

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


@needs8
def test_kernel_mesh_context():
    mesh = create_mesh(dp=4, fsdp=2, tp=1)
    assert current_kernel_mesh() is None
    with kernel_mesh(mesh, axes=("dp", "fsdp", "nope")):
        m, axes = current_kernel_mesh()
        assert m is mesh and axes == ("dp", "fsdp")
    assert current_kernel_mesh() is None


@needs8
@pytest.mark.parametrize("n", [4096, 4100])  # divisible and padded row counts
def test_vq_argmin_sharded_matches_unsharded(n):
    """shard_map'd VQ argmin must equal the XLA argmin exactly (deterministic
    row-parallel search; codebook replicated)."""
    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    rs = np.random.RandomState(0)
    z = jnp.asarray(rs.randn(n, 32).astype(np.float32))
    cb = jnp.asarray(rs.randn(1024, 32).astype(np.float32))
    ref = np.asarray(jnp.argmin(compute_distances(z, cb), axis=1))
    with kernel_mesh(mesh):
        got = vq_argmin(z, cb, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), ref)


@needs8
def test_vq_argmin_sharded_emits_no_allgather():
    """The point of the shard_map wrapper: the compiled sharded program must
    contain NO all-gather (pallas_call alone would make GSPMD gather the full
    row set onto every device)."""
    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    rs = np.random.RandomState(1)
    z = jnp.asarray(rs.randn(4096, 32).astype(np.float32))
    cb = jnp.asarray(rs.randn(1024, 32).astype(np.float32))
    row_sh = NamedSharding(mesh, P(("dp", "fsdp")))
    z = jax.device_put(z, NamedSharding(mesh, P(("dp", "fsdp"), None)))
    cb = jax.device_put(cb, NamedSharding(mesh, P(None, None)))

    def f(z, cb):
        with kernel_mesh(mesh):
            return vq_argmin(z, cb, interpret=True)

    txt = (jax.jit(f, out_shardings=row_sh).lower(z, cb).compile().as_text())
    assert "all-gather" not in txt, "sharded vq_argmin all-gathers its rows"
    assert "all-reduce" not in txt


@needs8
def test_fused_categorical_sharded_emits_no_allgather():
    """dp-sharded sampling must stay local: no all-gather of the (N, V)
    logits in the compiled program."""
    mesh = create_mesh(dp=8, fsdp=1, tp=1)
    rs = np.random.RandomState(4)
    logits = jnp.asarray(rs.randn(8, 64, 512).astype(np.float32))
    g = jax.random.gumbel(jax.random.PRNGKey(2), logits.shape, jnp.float32)
    lsh = NamedSharding(mesh, P("dp", None, None))
    logits = jax.device_put(logits, lsh)
    g = jax.device_put(g, lsh)

    def f(logits, g):
        with kernel_mesh(mesh, axes=("dp",)):
            return fused_categorical(0, logits, interpret=True, gumbel=g)

    txt = jax.jit(f).lower(logits, g).compile().as_text()
    assert "all-gather" not in txt
    assert "all-reduce" not in txt


@needs8
def test_fused_categorical_sharded_matches_unsharded():
    """With explicit gumbel noise the sharded sampling kernel is exact: the
    noise shards with the rows, so shard boundaries cannot change any row's
    argmax or confidence."""
    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    rs = np.random.RandomState(2)
    logits = jnp.asarray(rs.randn(8, 64, 512).astype(np.float32) * 3)
    g = jax.random.gumbel(jax.random.PRNGKey(0), logits.shape, jnp.float32)
    ids_ref, sel_ref = fused_categorical(0, logits, interpret=True, gumbel=g)
    with kernel_mesh(mesh):
        ids, sel = fused_categorical(0, logits, interpret=True, gumbel=g)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_allclose(np.asarray(sel), np.asarray(sel_ref),
                               atol=1e-6, rtol=1e-5)


@needs8
def test_fused_categorical_cfg_sharded_matches_unsharded():
    """CFG variant: the (cond, uncond) pair axis is replicated and rows shard,
    so every shard combines matching halves; explicit noise makes it exact."""
    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    rs = np.random.RandomState(3)
    B, S, VRAW, VLIM = 4, 32, 1000, 960
    logits = jnp.asarray(rs.randn(2 * B, S, VRAW).astype(np.float32) * 2)
    noise = jax.random.gumbel(jax.random.PRNGKey(1), (B, S, VRAW), jnp.float32)
    ids_ref, sel_ref = fused_categorical_cfg(0, logits, 4.0, VLIM,
                                             interpret=True, gumbel=noise)
    with kernel_mesh(mesh):
        ids, sel = fused_categorical_cfg(0, logits, 4.0, VLIM,
                                         interpret=True, gumbel=noise)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_allclose(np.asarray(sel), np.asarray(sel_ref),
                               atol=1e-6, rtol=1e-5)


@needs8
def test_train_step_hlo_has_promised_collectives():
    """Round-4 verdict item 6: the overfit gate catches wrong math but not
    silent full replication.  Compile the real train step on the mixed
    dp=2/fsdp=2/tp=2 mesh and assert the optimized HLO carries the
    collectives the sharding rules promise (parallel/sharding.py): gradient/
    loss reductions (all-reduce or reduce-scatter) and fsdp param gathering
    (all-gather)."""
    import __graft_entry__ as ge
    from open_muse_tpu.training import trainer as T
    from open_muse_tpu.training.optimizers import get_optimizer
    from open_muse_tpu.ops.sampling import cosine_schedule

    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    model = ge._flagship(tiny=True)
    tx = get_optimizer("adamw", 3e-4, max_grad_norm=1.0)
    step_fn = T.make_uvit_train_step(
        model.module, tx, cosine_schedule, model.config.mask_token_id,
        codebook_size=model.config.codebook_size, cond_dropout_prob=0.1)
    state = T.create_train_state(model.params, tx, mesh=mesh)
    batch = ge._make_batch(mesh, batch_size=8)
    txt = step_fn.lower(state, batch, jax.random.PRNGKey(0)).compile().as_text()

    n_ar = txt.count(" all-reduce")
    n_ag = txt.count(" all-gather")
    n_rs = txt.count(" reduce-scatter")
    assert n_ar + n_rs > 0, \
        f"no gradient/loss reduction collective in train-step HLO " \
        f"(ar={n_ar}, rs={n_rs})"
    assert n_ag + n_rs > 0, \
        f"no fsdp param gather/scatter in train-step HLO " \
        f"(ag={n_ag}, rs={n_rs})"


# ---- weight-consuming kernels on dp-only meshes (round-4 follow-up to
# verdict item 5: the GLU and attention-sublayer kernels were single-device
# only; on a replicated-weight mesh they now shard their batch rows) -------


@needs8
def test_replicated_weight_mesh_policy():
    """Weight kernels engage only when no mesh axis shards the weights:
    dp-only meshes qualify, any fsdp/tp parallelism does not."""
    from open_muse_tpu.parallel.kernel_mesh import replicated_weight_mesh

    assert replicated_weight_mesh() is None  # no context
    with kernel_mesh(create_mesh(dp=8, fsdp=1, tp=1), axes=("dp",)):
        m, axes = replicated_weight_mesh()
        assert axes == ("dp",) and m.shape["dp"] == 8
    with kernel_mesh(create_mesh(dp=2, fsdp=2, tp=2)):
        assert replicated_weight_mesh() is None  # fsdp/tp shard the weights
    with kernel_mesh(create_mesh(dp=4, fsdp=2, tp=1)):
        assert replicated_weight_mesh() is None
    one = create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    with kernel_mesh(one, axes=("dp",)):
        assert replicated_weight_mesh() is None  # single shard: plain path


@needs8
def test_glu_sharded_matches_unsharded():
    """Row-sharded GLU down-matmul must equal the single-shard kernel
    exactly: rows are independent and the K-block accumulation order per row
    is identical."""
    from open_muse_tpu.ops.pallas.glu_matmul import glu_down_matmul

    mesh = create_mesh(dp=8, fsdp=1, tp=1)
    rs = np.random.RandomState(5)
    a = jnp.asarray(rs.randn(1024, 256).astype(np.float32))
    b = jnp.asarray(rs.randn(1024, 256).astype(np.float32))
    wo = jnp.asarray(rs.randn(256, 128).astype(np.float32) * 0.05)
    ref = glu_down_matmul(a, b, wo, interpret=True)
    with kernel_mesh(mesh, axes=("dp",)):
        got = glu_down_matmul(a, b, wo, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@needs8
def test_glu_sharded_emits_no_allgather():
    from open_muse_tpu.ops.pallas.glu_matmul import glu_down_matmul

    mesh = create_mesh(dp=8, fsdp=1, tp=1)
    rs = np.random.RandomState(6)
    a = jax.device_put(jnp.asarray(rs.randn(1024, 256).astype(np.float32)),
                       NamedSharding(mesh, P("dp", None)))
    b = jax.device_put(jnp.asarray(rs.randn(1024, 256).astype(np.float32)),
                       NamedSharding(mesh, P("dp", None)))
    wo = jax.device_put(jnp.asarray(rs.randn(256, 128).astype(np.float32)),
                        NamedSharding(mesh, P(None, None)))

    def f(a, b, wo):
        with kernel_mesh(mesh, axes=("dp",)):
            return glu_down_matmul(a, b, wo, interpret=True)

    txt = jax.jit(f).lower(a, b, wo).compile().as_text()
    assert "all-gather" not in txt
    assert "all-reduce" not in txt


def _attn_inputs(batch, seq=64, hidden=128, kv_len=16, seed=7):
    rs = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rs.randn(*s).astype(np.float32) * 0.1)
    return dict(x=mk(batch, seq, hidden), res=mk(batch, seq, hidden),
                ln=jnp.ones((hidden,), jnp.float32),
                adaln=mk(batch, 2 * hidden), wqkv=mk(hidden, 3 * hidden),
                wq=mk(hidden, hidden), wout=mk(hidden, hidden),
                kv=mk(batch, kv_len, 2 * hidden))


@needs8
def test_attn_sublayer_sharded_matches_unsharded():
    """Batch-sharded fused attention sublayer (self + cross) must equal the
    single-shard kernel exactly: the grid is one cell per batch element, so
    shard boundaries cannot change any cell's math."""
    from open_muse_tpu.ops.pallas.attn_sublayer import (attn_sublayer_cross,
                                                        attn_sublayer_self)

    mesh = create_mesh(dp=8, fsdp=1, tp=1)
    p = _attn_inputs(batch=16)
    ref_o, ref_r = attn_sublayer_self(p["x"], p["res"], p["ln"], p["adaln"],
                                      p["wqkv"], p["wout"], num_heads=2)
    with kernel_mesh(mesh, axes=("dp",)):
        got_o, got_r = attn_sublayer_self(p["x"], p["res"], p["ln"],
                                          p["adaln"], p["wqkv"], p["wout"],
                                          num_heads=2)
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(ref_r))

    ref_o, ref_r = attn_sublayer_cross(p["x"], p["res"], p["ln"], p["adaln"],
                                       p["wq"], p["wout"], p["kv"],
                                       num_heads=2)
    with kernel_mesh(mesh, axes=("dp",)):
        got_o, got_r = attn_sublayer_cross(p["x"], p["res"], p["ln"],
                                           p["adaln"], p["wq"], p["wout"],
                                           p["kv"], num_heads=2)
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(ref_r))


@needs8
def test_attn_sublayer_sharded_emits_no_allgather():
    from open_muse_tpu.ops.pallas.attn_sublayer import attn_sublayer_self

    mesh = create_mesh(dp=8, fsdp=1, tp=1)
    p = _attn_inputs(batch=16)
    bsh = NamedSharding(mesh, P("dp", None, None))
    rep = NamedSharding(mesh, P())
    x = jax.device_put(p["x"], bsh)
    res = jax.device_put(p["res"], bsh)
    adaln = jax.device_put(p["adaln"], NamedSharding(mesh, P("dp", None)))
    ln, wqkv, wout = (jax.device_put(p[k], rep)
                      for k in ("ln", "wqkv", "wout"))

    def f(x, res, ln, adaln, wqkv, wout):
        with kernel_mesh(mesh, axes=("dp",)):
            return attn_sublayer_self(x, res, ln, adaln, wqkv, wout,
                                      num_heads=2)

    txt = jax.jit(f).lower(x, res, ln, adaln, wqkv, wout).compile().as_text()
    assert "all-gather" not in txt
    assert "all-reduce" not in txt


@needs8
def test_attn_sublayer_indivisible_batch_falls_back_correct():
    """batch % shard_count != 0: the mesh path must produce the same values
    through the XLA fallback instead of letting GSPMD all-gather around an
    unsharded pallas_call."""
    from open_muse_tpu.ops.pallas.attn_sublayer import (_xla_ref_self,
                                                        attn_sublayer_self)

    mesh = create_mesh(dp=8, fsdp=1, tp=1)
    p = _attn_inputs(batch=6)
    with kernel_mesh(mesh, axes=("dp",)):
        got_o, got_r = attn_sublayer_self(p["x"], p["res"], p["ln"],
                                          p["adaln"], p["wqkv"], p["wout"],
                                          num_heads=2)
    ref_o, ref_r = _xla_ref_self(p["x"], p["res"], p["ln"], p["adaln"],
                                 p["wqkv"], p["wout"], 2, 1e-6)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(ref_r))

"""Multi-chip sharding dry run on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as G
    G.dryrun_multichip(8)


def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    import __graft_entry__ as G
    G.dryrun_multichip(2)


def test_entry_compiles():
    import __graft_entry__ as G
    fn, args = G.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


def test_fsdp_layer_sharding():
    """FSDP-style layer-axis sharding computes identically to replicated."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from open_whisper_kit_tpu.models.whisper import model as M
    from open_whisper_kit_tpu.parallel import mesh as X

    mesh = X.make_mesh(4, tp=2)  # dp=2, tp=2
    cfg = M.WhisperConfig(128, 32, 64, 2, 4, 16, 64, 2, 4, 80)
    params = M.init_params(cfg, seed=0, dtype=jnp.float32)

    mel = np.random.default_rng(0).standard_normal((2, 64, 80)).astype(np.float32)
    ref = np.asarray(M.encode(cfg, params["encoder"], jnp.asarray(mel)))

    specs = X.whisper_param_specs(cfg, fsdp_axis="dp")
    sharded = X.shard_params(params, mesh, specs)
    with mesh:
        got = np.asarray(M.encode(cfg, sharded["encoder"],
                                  jax.device_put(mel, X.batch_sharding(mesh))))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_prepared_param_specs_shard_context():
    """prepared_param_specs matches a live (qkv-fused) context; whisper_full
    runs on the sharded params (the launch_multihost.py placement)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import jax.numpy as jnp
    from open_whisper_kit_tpu.decode import full as F
    from open_whisper_kit_tpu.decode.params import FullParams
    from open_whisper_kit_tpu.parallel import mesh as X

    ctx = F.WhisperContext.from_preset("tiny", dtype=jnp.float32)
    mesh = X.make_mesh(8, tp=2)
    specs = X.prepared_param_specs(ctx.cfg)
    ctx.params = X.shard_params(ctx.params, mesh, specs)
    audio = np.sin(np.arange(16000 * 2) / 40).astype(np.float32) * 0.1
    p = FullParams(print_progress=False)
    p.greedy.best_of = 1
    p.temperature_inc = 0.0
    with mesh:
        res = F.whisper_full(ctx, p, audio)
    assert res is not None

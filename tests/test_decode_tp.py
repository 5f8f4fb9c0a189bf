"""Tensor-parallel megakernel weight stream (ops/decode_tp.py).

VERDICT r4 ask #6: tp-sharded decode on the virtual CPU mesh must be
BIT-FOR-BIT identical to the single-chip run (column-parallel design:
each output element is a full-K dot computed by exactly one device), and
semantically match the monolithic megakernel / XLA decode paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from open_whisper_kit_tpu.models.whisper import model as M
from open_whisper_kit_tpu.ops import decode_tp as DTP


def _setup(preset="tiny", seed=0):
    cfg = M.PRESETS[preset]
    params = M.init_params(cfg, seed=seed, dtype=jnp.bfloat16)
    dec = M.prepare_decoder(params["decoder"])
    rng = np.random.default_rng(seed)
    enc = jnp.asarray(rng.standard_normal(
        (1, 64, cfg.n_audio_state)), jnp.bfloat16)   # short Ta: fast CPU
    xk, xv = M.cross_kv(cfg, dec, enc)
    from open_whisper_kit_tpu.ops.decode_megakernel import hm_to_natural
    return cfg, dec, hm_to_natural(xk), hm_to_natural(xv)


def _mesh(n):
    devs = np.asarray(jax.devices()[:n]).reshape(n)
    return Mesh(devs, ("tp",))


def _run_steps(cfg, mp, xkn, xvn, mesh, n_steps=3, Tc=32):
    S = cfg.n_text_state
    L = cfg.n_text_layer
    kv_k = jnp.zeros((L, Tc, S), jnp.bfloat16)
    kv_v = jnp.zeros((L, Tc, S), jnp.bfloat16)
    rng = np.random.default_rng(7)
    outs = []
    for i in range(n_steps):
        x0 = jnp.asarray(rng.standard_normal((1, S)) * 0.1, jnp.bfloat16)
        logits, kv_k, kv_v = DTP.mega_decode_step_tp(
            cfg, mp, x0, kv_k, kv_v, jnp.int32(i), xkn, xvn, mesh=mesh)
        outs.append(np.asarray(logits))
    return outs, np.asarray(kv_k), np.asarray(kv_v)


def test_tp2_bitwise_equals_tp1():
    cfg, dec, xkn, xvn = _setup()
    mp1 = DTP.prepare_mega_tp(cfg, dec, tp=1)
    mp2 = DTP.prepare_mega_tp(cfg, dec, tp=2)
    o1, k1, v1 = _run_steps(cfg, mp1, xkn, xvn, _mesh(1))
    o2, k2, v2 = _run_steps(cfg, mp2, xkn, xvn, _mesh(2))
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(a, b)   # bit-for-bit
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(v1, v2)


def test_tp4_bitwise_equals_tp1_multirow():
    # R=3 rows (speculative-verify shape) through tp=4 — hits the
    # multi-row causal mask and the Hd=1.5... tiny has H=6 heads: tp=3
    cfg, dec, xkn, xvn = _setup(seed=1)
    mp1 = DTP.prepare_mega_tp(cfg, dec, tp=1)
    mp3 = DTP.prepare_mega_tp(cfg, dec, tp=3)
    S, L, Tc = cfg.n_text_state, cfg.n_text_layer, 32
    rng = np.random.default_rng(9)
    x0 = jnp.asarray(rng.standard_normal((3, S)) * 0.1, jnp.bfloat16)

    def run(mp, mesh):
        kv_k = jnp.zeros((L, Tc, S), jnp.bfloat16)
        kv_v = jnp.zeros((L, Tc, S), jnp.bfloat16)
        return DTP.mega_decode_step_tp(cfg, mp, x0, kv_k, kv_v,
                                       jnp.int32(4), xkn, xvn, mesh=mesh)

    l1, k1, v1 = run(mp1, _mesh(1))
    l3, k3, v3 = run(mp3, _mesh(3))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l3))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k3))


def test_tp_semantics_match_megakernel():
    """Same int8 planes, same greedy trajectory scale: the TP step's
    logits must track the monolithic megakernel's within dequant-order
    noise (both dequantize identical q8_0 planes)."""
    from open_whisper_kit_tpu.ops import decode_megakernel as MK

    cfg, dec, xkn, xvn = _setup(seed=2)
    S, L = cfg.n_text_state, cfg.n_text_layer
    Tc = cfg.n_text_ctx
    mp_mega = MK.prepare_mega(cfg, dec, quant="all")
    mp_tp = DTP.prepare_mega_tp(cfg, dec, tp=2)
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.standard_normal((1, S)) * 0.1, jnp.bfloat16)

    z = lambda: jnp.zeros((L, Tc, S), jnp.bfloat16)
    lm, _, _ = MK.mega_decode_step(cfg, mp_mega, x0, z(), z(), jnp.int32(0),
                                   xkn, xvn, interpret=True)
    lt, _, _ = DTP.mega_decode_step_tp(cfg, mp_tp, x0, z(), z(),
                                       jnp.int32(0), xkn, xvn, mesh=_mesh(2))
    a = np.asarray(lm, np.float32)[0]
    b = np.asarray(lt, np.float32)[0]
    # identical quantized weights; differences are accumulation order only
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    # and the argmax (the decoded token) agrees
    assert a.argmax() == b.argmax()


def test_prepare_rejects_bad_tp():
    cfg, dec, _, _ = _setup()
    with pytest.raises(ValueError):
        DTP.prepare_mega_tp(cfg, dec, tp=4)   # tiny H=6: not divisible

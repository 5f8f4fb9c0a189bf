"""Reference-parity RNG sampling (FullParams.ref_sampling).

The reference's beam candidates are k DRAWS from
``std::discrete_distribution<>(probs)`` with a per-decoder
``std::mt19937`` (whisper.cpp:6519-6592; decoder j seeded with j,
whisper.cpp:3470 + 6929).  ``utils/mt19937.py`` reproduces that machinery
bit-for-bit; these tests pin it against a C++ oracle compiled with the
in-image g++ + libstdc++ — the exact runtime the reference binary links.

Full e2e BYTE parity of beam transcripts additionally needs the two
engines' probability vectors to agree to ~TV<1e-5.  On the random-weight
test checkpoints the distributions are near-uniform over 51k tokens, so
the known ~1e-3-relative logit envelope between ggml's f16 matmuls and
our f32 path (tests/test_ref_golden.py) becomes a percent-level total-
variation distance and draws diverge by design, not by bug.  With real
checkpoints (peaked distributions) --ref-sampling --dtype f32 is expected
to byte-match `whisper-cli -bs N`; the offline procedure is recorded in
docs/ROADMAP.md next to the WER-parity item (both blocked on zero
egress).
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests import test_ref_golden as TRG

ORACLE_BUILD = Path("/tmp/owk_refbuild_ddoracle")

_ORACLE_SRC = r"""
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>
// modes:
//   draws  <seed> <n>   : n draws from one dist (weights on stdin)
//   beams  <k> <steps>  : the reference's beam bookkeeping shape —
//     5 decoders with persistent mt19937(j) streams; at step i decoder j
//     is active while j >= i (a shrinking active set, like decoders
//     completing); each ACTIVE decoder draws k ids from a FRESH
//     discrete_distribution over step-and-decoder-dependent weights
//     (w[t] = ((lcg >> 8) % 1000) * 1e-6f, lcg seeded 1000+97*i+j).
//     Validates stream persistence across steps and dist objects.
int main(int argc, char **argv) {
    if (std::string(argv[1]) == "draws") {
        unsigned seed = (unsigned)atoi(argv[2]);
        int n = atoi(argv[3]);
        std::vector<float> w;
        float f;
        while (scanf("%f", &f) == 1) w.push_back(f);
        std::mt19937 rng(seed);
        std::discrete_distribution<> dist(w.begin(), w.end());
        for (int i = 0; i < n; i++) printf("%d\n", dist(rng));
        return 0;
    }
    int k = atoi(argv[2]), steps = atoi(argv[3]);
    std::vector<std::mt19937> rngs;
    for (int j = 0; j < 5; j++) rngs.emplace_back(j);
    for (int i = 0; i < steps; i++) {
        for (int j = 0; j < 5; j++) {
            if (j < i) continue;           // "completed" decoder: no draws
            std::vector<float> w(4096);
            unsigned long long lcg = 1000 + 97 * i + j;
            for (auto &x : w) {
                lcg = lcg * 6364136223846793005ULL + 1442695040888963407ULL;
                x = float((lcg >> 8) % 1000) * 1e-6f;
            }
            std::discrete_distribution<> dist(w.begin(), w.end());
            for (int c = 0; c < k; c++) printf("%d %d %d\n", i, j, dist(rngs[j]));
        }
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def dd_oracle():
    ORACLE_BUILD.mkdir(exist_ok=True)
    exe = ORACLE_BUILD / "dd_oracle"
    if not exe.exists():
        src = ORACLE_BUILD / "dd_oracle.cpp"
        src.write_text(_ORACLE_SRC)
        r = subprocess.run(["g++", "-O2", "-o", str(exe), str(src)],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"g++ unavailable/failed: {r.stderr[-300:]}")
    return exe


def test_mt19937_known_vector():
    from open_whisper_kit_tpu.utils.mt19937 import MT19937
    e = MT19937()  # default seed 5489
    out = e.draw_block(10000)
    assert int(out[-1]) == 4123659995  # canonical MT19937 test vector


def test_discrete_distribution_oracle(dd_oracle):
    from open_whisper_kit_tpu.utils.mt19937 import (MT19937,
                                                    DiscreteDistribution)
    rng = np.random.default_rng(42)
    for seed, size in ((0, 51866), (3, 51866), (7, 997), (123, 2)):
        w = rng.random(size, np.float32)
        w[rng.random(size) < 0.3] = 0.0  # suppressed tokens
        if not w.any():
            w[0] = 1.0
        stdin = "\n".join("%.9g" % x for x in w)
        r = subprocess.run([str(dd_oracle), "draws", str(seed), "200"],
                           input=stdin, capture_output=True, text=True,
                           timeout=120)
        assert r.returncode == 0, r.stderr[-300:]
        ref = [int(x) for x in r.stdout.split()]
        dist = DiscreteDistribution(w)
        eng = MT19937(seed)
        ours = dist.draw_k(eng, 200)
        assert ours == ref, f"seed={seed} size={size}: first diff at " \
            f"{next(i for i, (a, b) in enumerate(zip(ours, ref)) if a != b)}"


def test_beam_stream_bookkeeping_oracle(dd_oracle):
    """Persistent per-decoder streams across steps + fresh dist objects +
    inactive-decoder skips — the exact rng bookkeeping whisper_full's
    beam loop relies on (whisper.cpp:7228-7265)."""
    from open_whisper_kit_tpu.utils.mt19937 import (MT19937,
                                                    DiscreteDistribution)
    k, steps = 5, 4
    r = subprocess.run([str(dd_oracle), "beams", str(k), str(steps)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-300:]
    ref = [tuple(int(x) for x in line.split())
           for line in r.stdout.strip().splitlines()]

    rngs = [MT19937(j) for j in range(5)]
    ours = []
    for i in range(steps):
        for j in range(5):
            if j < i:
                continue
            lcg = np.uint64(1000 + 97 * i + j)
            w = np.empty(4096, np.float32)
            A = np.uint64(6364136223846793005)
            C = np.uint64(1442695040888963407)
            with np.errstate(over="ignore"):
                for t in range(4096):
                    lcg = lcg * A + C
                    w[t] = np.float32(
                        np.float32((lcg >> np.uint64(8)) % np.uint64(1000))
                        * np.float32(1e-6))
            dist = DiscreteDistribution(w)
            for _ in range(k):
                ours.append((i, j, dist(rngs[j])))
    assert ours == ref


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    from open_whisper_kit_tpu.io import quant
    from open_whisper_kit_tpu.io.ggml_whisper import load_checkpoint
    from open_whisper_kit_tpu.io.ggml_writer import (
        random_reference_tensors, write_checkpoint)

    stub = TRG.REF / "models" / "for-tests-ggml-tiny.en.bin"
    if not stub.exists():
        pytest.skip("reference stub model not available")
    ck = load_checkpoint(stub)
    tensors = random_reference_tensors(ck.hparams, seed=1234)
    path = tmp_path_factory.mktemp("ckpt") / "random-tiny.en.bin"
    write_checkpoint(path, ck.hparams, ck.mel_filters, ck.tokens, tensors,
                     wtype=quant.GGML_TYPE_F16)
    return path


def test_ref_sampling_deterministic_e2e(checkpoint, tmp_path):
    """--ref-sampling beam-5 through the CLI: runs end-to-end on the host
    beam path and is bit-deterministic across processes (the mt19937
    streams fully determine the draws)."""
    wav = TRG.REF / "samples" / "jfk.wav"
    if not wav.exists():
        pytest.skip("jfk.wav not available")
    from open_whisper_kit_tpu.cli.main import main

    outs = []
    for run in ("a", "b"):
        out = tmp_path / run
        assert main(["-m", str(checkpoint), "-f", str(wav), "-otxt",
                     "-osrt", "-np", "-bs", "5", "-bo", "5", "-nf",
                     "--ref-sampling", "-of", str(out)]) == 0
        outs.append(out.with_suffix(".txt").read_bytes()
                    + out.with_suffix(".srt").read_bytes())
    assert outs[0] == outs[1]
    assert outs[0].strip()  # non-empty transcript

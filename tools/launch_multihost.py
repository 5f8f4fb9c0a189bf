#!/usr/bin/env python3
"""Multi-host bring-up for distributed transcription serving.

TPU-native stand-in for the reference's ggml-rpc worker deployment
(ggml/src/ggml-rpc/: rpc-server per box + RPC backend in the client): on
TPU pods every host runs the SAME program, `jax.distributed` wires the
hosts together, and GSPMD shards work over the global mesh — there is no
client/server asymmetry to configure.

Run on every host of the slice (or let the TPU runtime's launcher do it):

    python tools/launch_multihost.py --coordinator 10.0.0.2:8476 \
        --num-hosts 4 --host-id $HOST_ID --model ggml-large-v3-turbo.bin \
        --files a.wav b.wav ...

On Cloud TPU VMs the coordinator/host-id flags can be omitted
(jax.distributed.initialize autodetects from the TPU metadata).

Work placement: 30 s windows are data-parallel over the global `dp` axis
(whisper_full_parallel semantics, src/whisper.cpp:7801-7929); each host
feeds its local shard of the batch (jax.make_array_from_process_local_data)
and collectives ride ICI, not DCN.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit to autodetect)")
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--host-id", type=int, default=None)
    ap.add_argument("--model", required=True)
    ap.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel width (default: auto)")
    ap.add_argument("--files", nargs="+", default=[])
    args = ap.parse_args(argv)

    import jax

    if args.coordinator:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_hosts,
                                   process_id=args.host_id)
    else:
        jax.distributed.initialize()   # TPU-VM metadata autodetect

    import jax.numpy as jnp

    from open_whisper_kit_tpu import api
    from open_whisper_kit_tpu.audio.wav import load_wav
    from open_whisper_kit_tpu.decode.params import FullParams
    from open_whisper_kit_tpu.parallel import mesh as X

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    pid = jax.process_index()
    print(f"[host {pid}] {n_local} local / {n_global} global devices",
          file=sys.stderr)

    mesh = X.make_mesh(tp=args.tp)
    # production mesh path: the constructor shards the prepared weights
    # (parallel/mesh.py shard_context_params) and every batched entry
    # point dp-shards its chunk axis — same code path as single-host
    # Transcriber(mesh=), validated multi-process by tests/test_multihost.py
    tr = api.Transcriber(model_path=args.model, dtype=jnp.bfloat16, mesh=mesh)

    # every host must execute the same jitted programs in the same order;
    # files are therefore broadcast (each host reads its own copy) and the
    # chunks inside each file are what parallelize over dp
    # (whisper_full_parallel chunk-split semantics, src/whisper.cpp:7801).
    params = FullParams(print_progress=False)
    with mesh:
        for fname in args.files:
            audio = load_wav(fname)
            res = tr.full_parallel(params, audio,
                                   n_processors=mesh.shape["dp"])
            if pid == 0:
                for s in res.segments:
                    print(f"[{s.t0/100:8.2f} --> {s.t1/100:8.2f}] {s.text}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

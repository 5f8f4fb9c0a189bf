"""Convert a silero-vad torch checkpoint to the VAD ggml-bin format.

Capability counterpart of models/convert-silero-vad-to-ggml.py. Reads the
state dict either from the `silero_vad` pip package (if installed) or from a
saved state-dict / TorchScript file.

Usage: python tools/convert_silero_to_ggml.py [silero.jit|state.pt] out.bin
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np


def load_state_dict(path: str | None):
    import torch
    if path is None:
        from silero_vad import load_silero_vad  # type: ignore
        return load_silero_vad().state_dict(), "unknown"
    p = Path(path)
    try:
        m = torch.jit.load(str(p), map_location="cpu")
        return m.state_dict(), "jit"
    except Exception:  # noqa: BLE001
        obj = torch.load(str(p), map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            return obj.state_dict(), "module"
        return obj, "state_dict"


def convert(state_dict, out_path: str, version=(6, 2, 0)):
    cleaned = {}
    for k, v in state_dict.items():
        if "_8k" in k:
            continue
        if not k.startswith("_model."):
            k = "_model." + k
        cleaned[k] = v

    enc_in = [129, 128, 64, 64]
    enc_out = [128, 64, 64, 128]

    with open(out_path, "wb") as f:
        f.write(struct.pack("<i", 0x67676D6C))
        mt = b"silero-16k"
        f.write(struct.pack("<i", len(mt)))
        f.write(mt)
        f.write(struct.pack("<3i", *version))
        f.write(struct.pack("<3i", 512, 64, 4))
        for i in range(4):
            f.write(struct.pack("<3i", enc_in[i], enc_out[i], 3))
        f.write(struct.pack("<2i", 128, 128))
        f.write(struct.pack("<2i", 128, 1))

        def write_tensor(name: str, data: np.ndarray, shape, f16: bool):
            dt = np.float16 if f16 else np.float32
            payload = np.ascontiguousarray(data, dt)
            name_b = name.encode()
            dims = list(reversed(shape))
            f.write(struct.pack("<3i", len(dims), len(name_b), 1 if f16 else 0))
            for d in dims:
                f.write(struct.pack("<i", d))
            f.write(name_b)
            f.write(payload.tobytes())

        order = []
        for i in range(4):
            order.append((f"_model.encoder.{i}.reparam_conv.weight", True))
            order.append((f"_model.encoder.{i}.reparam_conv.bias", False))
        order += [("_model.decoder.rnn.weight_ih", False),
                  ("_model.decoder.rnn.weight_hh", False),
                  ("_model.decoder.rnn.bias_ih", False),
                  ("_model.decoder.rnn.bias_hh", False),
                  ("_model.decoder.decoder.2.weight", True),
                  ("_model.decoder.decoder.2.bias", False)]

        for name, f16 in order:
            t = cleaned[name].detach().cpu().float().numpy().squeeze()
            write_tensor(name, t, list(t.shape), f16)

        # STFT basis written un-squeezed, dims reversed as (KW, IC, OC)
        stft = cleaned["_model.stft.forward_basis_buffer"].detach().cpu().float().numpy()
        write_tensor("_model.stft.forward_basis_buffer", stft,
                     [stft.shape[0], stft.shape[1], stft.shape[2]], True)
    print(f"wrote {out_path}")


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) not in (1, 2):
        print(__doc__, file=sys.stderr)
        return 1
    src = argv[0] if len(argv) == 2 else None
    out = argv[-1]
    sd, kind = load_state_dict(src)
    convert(sd, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())

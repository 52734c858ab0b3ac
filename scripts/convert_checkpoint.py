"""CLI: convert reference PyTorch checkpoints to this framework's .npz format.

    python scripts/convert_checkpoint.py denoiser paella_v3.pt out_denoiser.npz
    python scripts/convert_checkpoint.py vqgan vqgan_f4.pt out_vqgan.npz
    python scripts/convert_checkpoint.py byt5 byt5_xl_statedict.pt out_byt5.npz
    python scripts/convert_checkpoint.py clip open_clip_vith14.pt out_clip.npz

The .npz files load with paella_tpu.train.checkpoints.load_params_npz.
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["denoiser", "vqgan", "byt5", "clip"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--byt5-embd", type=int, default=2560, help="denoiser byt5_embd (2560 for v1/v3)")
    args = ap.parse_args()

    from paella_tpu.convert import (
        convert_paella,
        convert_vqgan,
        load_torch_state_dict,
    )
    from paella_tpu.train.checkpoints import save_params_npz

    if args.kind == "denoiser":
        import dataclasses

        from paella_tpu.config import PaellaConfig

        cfg = dataclasses.replace(PaellaConfig(), byt5_embd=args.byt5_embd)
        sd = load_torch_state_dict(args.src)
        save_params_npz(args.dst, convert_paella(sd, cfg))
    elif args.kind == "vqgan":
        sd = load_torch_state_dict(args.src)
        save_params_npz(args.dst, convert_vqgan(sd))
    elif args.kind == "byt5":
        from paella_tpu.cond import T5Config, convert_t5_encoder

        sd = load_torch_state_dict(args.src, key=None)
        save_params_npz(args.dst, convert_t5_encoder(sd, T5Config.byt5_xl()))
    elif args.kind == "clip":
        from paella_tpu.cond import (
            CLIPTextConfig,
            CLIPVisionConfig,
            convert_open_clip_text,
            convert_open_clip_vision,
        )

        sd = load_torch_state_dict(args.src, key=None)
        save_params_npz(
            args.dst,
            {
                "text": convert_open_clip_text(sd, CLIPTextConfig.vit_h_14()),
                "vision": convert_open_clip_vision(sd, CLIPVisionConfig.vit_h_14()),
            },
        )
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()

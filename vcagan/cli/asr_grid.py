"""GRID ASR content-accuracy CLI — counterpart of ASR_model/GRID/test.py.

    python -m vcagan.cli.asr_grid --data ./test/spec_mel --gtpath <GRID_root> \
        --checkpoint <converted_ckpt>

Checkpoints: either an orbax directory produced by this framework's ASR
training, or a reference torch .ckpt converted with
tools/convert_torch_ckpt.py --model grid_asr.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="./test/spec_mel")
    p.add_argument("--wav", default=False, action="store_true")
    p.add_argument("--gtpath", default="GT_path")
    p.add_argument("--model", default="GRID_CTC")
    p.add_argument("--checkpoint_dir", type=str, default="./data")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=160)
    p.add_argument("--subject", default="overlap")
    p.add_argument("--max_timesteps", type=int, default=75)
    p.add_argument("--max_text_len", type=int, default=75)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--dataparallel", default=False, action="store_true")
    p.add_argument("--gpu", type=str, default="0")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu)")
    return p.parse_args(argv)


def main(argv=None):
    from vcagan.runtime import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from vcagan.eval.asr_grid import evaluate
    from vcagan.eval.asr_models import GridASR
    import jax.numpy as jnp

    if args.checkpoint:
        from vcagan.io.checkpoint import CheckpointManager
        import os

        if os.path.isdir(args.checkpoint) and os.path.exists(
            os.path.join(args.checkpoint, "_CHECKPOINT_METADATA")
        ):
            import orbax.checkpoint as ocp

            variables = ocp.StandardCheckpointer().restore(args.checkpoint)
        else:
            variables = np.load(args.checkpoint, allow_pickle=True)[
                "variables"
            ].item()
    else:
        # random init (smoke mode): numbers are meaningless but the full
        # path runs end-to-end
        model = GridASR()
        mel = jnp.zeros((1, 80, 300, 1))
        variables = model.init({"params": jax.random.PRNGKey(0)}, mel, train=False)

    wer, cer = evaluate(
        args.data,
        args.gtpath,
        variables,
        wav=args.wav,
        batch_size=args.batch_size,
        max_timesteps=args.max_timesteps,
    )
    print("test_cer:", cer)
    print("test_wer:", wer)


if __name__ == "__main__":
    main()

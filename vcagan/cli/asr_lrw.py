"""LRW word-accuracy CLI — counterpart of ASR_model/LRW/test.py."""

from __future__ import annotations

import argparse

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="./test/spec_mel")
    p.add_argument("--wav", default=False, action="store_true")
    p.add_argument("--class_list", default="./data/class.txt")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=120)
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

    import jax.numpy as jnp

    from vcagan.eval.asr_lrw import LRW_MEL_FRAMES, evaluate, load_class_list
    from vcagan.eval.asr_models import LRWClassifier

    classes = load_class_list(args.class_list)
    if args.checkpoint:
        import os

        if os.path.isfile(args.checkpoint):
            # the reference's torch checkpoint (ASR_model/LRW/test.py:56-58:
            # dict of a_front_state_dict + a_back_state_dict) — convert in
            # place so the published 98.46%-accuracy evaluator is usable
            import torch

            from tools.convert_torch_ckpt import convert_lrw_asr

            ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
            variables = convert_lrw_asr(
                ckpt["a_front_state_dict"], ckpt["a_back_state_dict"]
            )
        else:
            import orbax.checkpoint as ocp

            variables = ocp.StandardCheckpointer().restore(args.checkpoint)
    else:
        model = LRWClassifier(num_classes=len(classes))
        mel = jnp.zeros((1, 80, LRW_MEL_FRAMES, 1))
        variables = model.init({"params": jax.random.PRNGKey(0)}, mel, train=False)

    acc, wer = evaluate(
        args.data, classes, variables, wav=args.wav, batch_size=args.batch_size
    )
    print("test_ACC:", acc, "WER:", wer)


if __name__ == "__main__":
    main()

"""Measure the reference PyTorch TRAIN-step throughput on CPU.

Builds the seven reference modules in place (/root/reference) and runs the
full GRID adversarial step exactly as reference train.py:160-237 does: mel
pyramid, D phase (real u/c logits x3 + R1 via autograd.grad + sync InfoNCE
+ fake logits on detached g1-3, backward with retain_graph), D step, G
phase (postnet, adversarial x3, gen-mode sync, L1 recon x3 + postnet L1),
G step.  Reports clips/s at the GRID shape (batch x 40-frame 112^2
windows) — the training-side counterpart of measure_torch_baseline.py.

Usage: python tools/measure_torch_train_baseline.py [--batch 16] [--steps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE = "/root/reference"
sys.path.insert(0, REFERENCE)

import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--window", type=int, default=40)
    p.add_argument("--steps", type=int, default=2)
    args = p.parse_args()

    from src.models.visual_front import Visual_front
    from src.models.generator import (
        Decoder,
        Discriminator,
        Postnet,
        gan_loss,
        sync_Discriminator,
    )

    torch.manual_seed(0)
    v_front = Visual_front(in_channels=1).train()
    gen = Decoder().train()
    post = Postnet().train()
    dis1 = Discriminator(phase="1").train()
    dis2 = Discriminator(phase="2").train()
    dis3 = Discriminator(phase="3").train()
    s_dis = sync_Discriminator(temp=1.0).train()

    g_opt = torch.optim.Adam(
        list(v_front.parameters()) + list(gen.parameters()) + list(post.parameters()),
        lr=1e-4, weight_decay=1e-5, amsgrad=True,
    )
    d_opt = torch.optim.Adam(
        list(dis1.parameters()) + list(dis2.parameters())
        + list(dis3.parameters()) + list(s_dis.parameters()),
        lr=1e-4, weight_decay=1e-5, amsgrad=True,
    )

    # reference Decoder hardcodes .cuda() for its injected noise
    # (generator.py:248); alias it to identity for the CPU measurement.
    torch.Tensor.cuda = lambda self, *a, **k: self

    b, w = args.batch, args.window
    vid = torch.randn(b, 1, w, 112, 112)
    mel = torch.clamp(torch.randn(b, 1, 80, 4 * w), -1, 1)
    spec = torch.abs(torch.randn(b, 1, 321, 4 * w))
    vid_len = torch.full((b,), w, dtype=torch.long)

    from torch.autograd import grad as t_grad

    def step():
        # mirrors reference train.py:160-237, exact call signatures
        v_front.zero_grad(), gen.zero_grad(), post.zero_grad()
        mel_r = mel.clone()
        mel1 = F.interpolate(mel_r, scale_factor=0.25, mode="bilinear")
        mel2 = F.interpolate(mel_r, scale_factor=0.5, mode="bilinear")

        phon, sent = v_front(vid)
        g1, g2, g3 = gen(sent, phon, vid_len)

        mel_r.requires_grad = True
        mel1.requires_grad_(True)
        mel2.requires_grad_(True)

        ur1, cr1 = dis1(mel1, sent.detach(), phon.size(1))
        ur2, cr2 = dis2(mel2, sent.detach(), phon.size(1))
        ur3, cr3 = dis3(mel_r, sent.detach(), phon.size(1))
        sync_loss = s_dis(phon, mel_r).mean()
        g_r1 = t_grad(ur1.sum(), mel1, create_graph=True)[0]
        g_r2 = t_grad(ur2.sum(), mel2, create_graph=True)[0]
        g_r3 = t_grad(ur3.sum(), mel_r, create_graph=True)[0]
        r1 = sum(
            (g.view(g.size(0), -1).norm(2, dim=1) ** 2).mean()
            for g in (g_r1, g_r2, g_r3)
        )
        uf1, cf1 = dis1(g1.detach(), sent.detach(), phon.size(1))
        uf2, cf2 = dis2(g2.detach(), sent.detach(), phon.size(1))
        uf3, cf3 = dis3(g3.detach(), sent.detach(), phon.size(1))
        real = (
            gan_loss(ur1, True) + gan_loss(ur2, True) + gan_loss(ur3, True)
            + gan_loss(cr1, True) + gan_loss(cr2, True) + gan_loss(cr3, True)
        ) / 3.0 + r1 / 3.0
        fake = (
            gan_loss(uf1, False) + gan_loss(uf2, False) + gan_loss(uf3, False)
            + gan_loss(cf1, False) + gan_loss(cf2, False) + gan_loss(cf3, False)
        ) / 3.0
        dis_loss = real + fake + sync_loss
        d_opt.zero_grad()
        dis_loss.backward(retain_graph=True)
        d_opt.step()

        gs = post(g3)
        ug1, cg1 = dis1(g1, sent.detach(), phon.size(1))
        ug2, cg2 = dis2(g2, sent.detach(), phon.size(1))
        ug3, cg3 = dis3(g3, sent.detach(), phon.size(1))
        g_loss = (
            gan_loss(ug1, True) + gan_loss(ug2, True) + gan_loss(ug3, True)
            + gan_loss(cg1, True) + gan_loss(cg2, True) + gan_loss(cg3, True)
        ) / 3.0 + s_dis(phon.detach(), g3, True).mean()
        recon = (
            F.l1_loss(g1, mel1) + F.l1_loss(g2, mel2) + F.l1_loss(g3, mel_r)
        ) / 3.0 + F.l1_loss(gs, spec)
        dis1.zero_grad(), dis2.zero_grad(), dis3.zero_grad()
        s_dis.zero_grad(), gen.zero_grad(), post.zero_grad()
        (g_loss + 50.0 * recon).backward()
        g_opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = (time.perf_counter() - t0) / args.steps
    print(
        json.dumps(
            {
                "metric": "torch_cpu_train_clips_per_sec",
                "value": round(b / dt, 2),
                "step_seconds": round(dt, 2),
                "batch": b,
                "window": w,
            }
        )
    )


if __name__ == "__main__":
    main()

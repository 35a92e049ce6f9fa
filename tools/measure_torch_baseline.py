"""One-off: measure the PyTorch-CPU baseline for bench.py's vs_baseline.

Runs the REFERENCE implementation (imported in place from /root/reference,
never copied) for the flagship inference path: visual front + generator +
postnet forward on a batch of 75-frame GRID clips, plus a 60-iteration
Griffin-Lim at 640/160 on the postnet output.  The reference's own
Griffin-Lim depends on librosa (absent here), so the vocoder leg is timed
with torch.stft/istft — if anything, a FASTER baseline than the reference's
conv1d-with-DFT-basis implementation, which makes the comparison
conservative.

The resulting mel-frames/sec number is recorded as TORCH_CPU_BASELINE in
bench.py with provenance.
"""

import sys
import time

import torch

sys.path.insert(0, "/root/reference")

from src.models.generator import Decoder, Postnet  # noqa: E402
from src.models.visual_front import Visual_front  # noqa: E402


def torch_griffin_lim(mag: torch.Tensor, n_iters: int = 60) -> torch.Tensor:
    """Standard GL on (B, F, T) magnitudes via torch.stft/istft."""
    n_fft, hop = 640, 160
    win = torch.hann_window(n_fft)
    b, f, t = mag.shape
    length = hop * (t - 1)
    angles = torch.rand_like(mag) * 2 * torch.pi - torch.pi
    spec = mag * torch.exp(1j * angles)
    for _ in range(n_iters):
        wav = torch.istft(
            spec, n_fft, hop, window=win, length=length
        )
        reana = torch.stft(
            wav, n_fft, hop, window=win, return_complex=True, center=True
        )
        spec = mag * torch.exp(1j * torch.angle(reana[:, :, :t]))
    return torch.istft(spec, n_fft, hop, window=win, length=length)


def main():
    torch.set_num_threads(torch.get_num_threads())
    torch.set_grad_enabled(False)

    b, frames = 4, 75
    mel_frames = 4 * frames

    v_front = Visual_front(in_channels=1).eval()
    gen = Decoder().eval()
    post = Postnet().eval()

    # reference Decoder hardcodes .cuda() for its noise; patch the RNG call
    # to CPU by monkeypatching torch.randn via a wrapper module is invasive —
    # instead temporarily alias .cuda() to identity.
    _orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        video = torch.randn(b, 1, frames, 112, 112)
        times = []
        for it in range(4):
            t0 = time.perf_counter()
            phon, sent = v_front(video)
            g1, g2, g3 = gen(sent, phon, torch.full((b,), frames, dtype=torch.long))
            gs = post(g3)
            mag = gs.squeeze(1).clamp_min(0.0)[:, :, :mel_frames]
            wav = torch_griffin_lim(mag.contiguous(), n_iters=60)
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"iter {it}: {dt:.2f}s")
    finally:
        torch.Tensor.cuda = _orig_cuda

    best = min(times[1:]) if len(times) > 1 else times[0]
    mel_fps = b * mel_frames / best
    print(f"torch-CPU baseline: batch={b} frames={frames} "
          f"best={best:.3f}s -> {mel_fps:.1f} mel-frames/sec")


if __name__ == "__main__":
    main()

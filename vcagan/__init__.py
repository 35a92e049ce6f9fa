"""vcagan: TPU-native lip-to-speech synthesis framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ms-dot-k/Visual-Context-Attentional-GAN (VCA-GAN, NeurIPS 2021 + the
ICASSP 2023 LRS2/LRS3 extension): silent lip video -> mel-spectrogram
-> linear spectrogram -> waveform, trained adversarially with
multi-scale mel discriminators and an audio-visual sync critic.

Layout
------
- ``vcagan.dsp``      STFT / mel / Griffin-Lim / emphasis filters (jnp, batched)
- ``vcagan.nn``       flax.linen model families (visual front, generator,
                      postnet, discriminators, sync critic, audio front)
- ``vcagan.kernels``  Pallas TPU kernels for the hot ops
- ``vcagan.train``    GAN train/eval steps, optimizers, schedules
- ``vcagan.parallel`` device mesh + shardings (DP over ICI, optional model axis)
- ``vcagan.data``     GRID / LRS2 / LRS3 pipelines, transforms, synthetic fixtures
- ``vcagan.eval``     STOI/ESTOI (on-device), ASR content-accuracy stacks
- ``vcagan.io``       orbax checkpoints, metric writers, wav/npz artifact dump
- ``vcagan.cli``      argv-compatible drivers (train/test, GRID and LRS)
"""

__version__ = "0.1.0"

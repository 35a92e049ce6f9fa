from vcagan.io.checkpoint import CheckpointManager
from vcagan.io.metrics import MetricWriter
from vcagan.io.wav import write_wav

__all__ = ["CheckpointManager", "MetricWriter", "write_wav"]

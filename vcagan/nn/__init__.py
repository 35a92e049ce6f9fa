from vcagan.nn.attention import AVAttention
from vcagan.nn.audio_front import AudioFront
from vcagan.nn.discriminator import Discriminator, SyncDiscriminator
from vcagan.nn.generator import Decoder, GenResBlk, Postnet, ResBlk1D
from vcagan.nn.gru import BiGRU
from vcagan.nn.fold import fold_conv_bn, fold_generator_side
from vcagan.nn.losses import gan_loss, r1_penalty
from vcagan.nn.resnet import BasicBlock, ResNetTrunk
from vcagan.nn.visual_front import VisualFront

__all__ = [
    "AVAttention",
    "AudioFront",
    "BasicBlock",
    "BiGRU",
    "Decoder",
    "Discriminator",
    "GenResBlk",
    "Postnet",
    "ResBlk1D",
    "ResNetTrunk",
    "SyncDiscriminator",
    "VisualFront",
    "fold_conv_bn",
    "fold_generator_side",
    "gan_loss",
    "r1_penalty",
]

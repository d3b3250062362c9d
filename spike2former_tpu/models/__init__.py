from .sdtv2 import SpikingMetaFormer
from .maskformer_head import MaskFormerHead, semantic_inference
from .pixel_decoder import DCNPixelDecoder, FPNPixelDecoder
from .segmentor import Spike2Former, preprocess, IMAGENET_MEAN, IMAGENET_STD
from .fpn import FPNSegmentor, FPNNeck, FPNHead
from .transformer_decoder import DetrDecoderLayer
from .dcn import DCNv3
from .attention import (SpikeMHA, LinearSpikeMHA, SpikeMultiheadAttention,
                        MSDAFFN, SpikeMLP3)
from .cascade import CascadeSegmentor, CascadeRefineHead
from .msresnet import MSResNet, SnnBasicBlock
from .cyclemlp import CycleFC, CycleMLP, CycleBlock
from .deformable import (SpikeMSDeformAttention, SpikeDeformableEncoder,
                         SpikeDeformableEncoderLayer)
from .spikeformer_lib import (SpikeformerSelfAttention,
                              SpikeformerCrossAttention, SpikeformerMLP,
                              SpikeformerDecoderLayer,
                              BaseTransformerDecoderLayer, QueryProposal)

__all__ = [
    "SpikingMetaFormer", "MaskFormerHead", "semantic_inference",
    "DCNPixelDecoder", "FPNPixelDecoder",
    "Spike2Former", "preprocess", "IMAGENET_MEAN", "IMAGENET_STD",
    "FPNSegmentor", "FPNNeck", "FPNHead", "DetrDecoderLayer", "DCNv3",
    "SpikeMHA", "LinearSpikeMHA", "SpikeMultiheadAttention", "MSDAFFN",
    "SpikeMLP3", "CascadeSegmentor", "CascadeRefineHead",
    "MSResNet", "SnnBasicBlock", "CycleFC", "CycleMLP", "CycleBlock",
    "SpikeMSDeformAttention", "SpikeDeformableEncoder",
    "SpikeDeformableEncoderLayer",
    "SpikeformerSelfAttention", "SpikeformerCrossAttention",
    "SpikeformerMLP", "SpikeformerDecoderLayer",
    "BaseTransformerDecoderLayer", "QueryProposal",
]

from .dla import DLA, BasicBlock, Root, Tree, DLA34_CHANNELS, DLA34_LEVELS
from .upsample import IDAUp, DLAUp
from .layers import ConvBnAct, ConvNode, GlobalConvNode, DeformConvNode, BilinearUp, NODE_TYPES
from .heads import DetectHeadSet, HeadTower, sigmoid_depth, clamp_sigmoid, SECONDARY_HEADS
from .detector import CenterFusionDLA, build_model

__all__ = [
    "DLA",
    "BasicBlock",
    "Root",
    "Tree",
    "DLA34_CHANNELS",
    "DLA34_LEVELS",
    "IDAUp",
    "DLAUp",
    "ConvBnAct",
    "ConvNode",
    "GlobalConvNode",
    "DeformConvNode",
    "BilinearUp",
    "NODE_TYPES",
    "DetectHeadSet",
    "HeadTower",
    "sigmoid_depth",
    "clamp_sigmoid",
    "SECONDARY_HEADS",
    "CenterFusionDLA",
    "build_model",
]

from .common import Classifier, GroupWiseLinear, Mlp
from .cvt import CvT, build_cvt
from .mstct import MSTCT
from .moco import MoCoEncoder, MoCoQueue, TERLModel
from .pipeline import EndToEndRecognizer
from .pretrained import load_backbone_variables, warm_start_backbone
from .qat import fake_quant_convs, fake_quant_kernel, qat_params
from .q2l import Q2L, Q2LTransformer
from .quant_dense import (collect_dense_scales, int8_apply,
                          quantize_dense_params)
from .quantized import make_int8_e2e, quantize_resnet, quantized_resnet_apply
from .resnet import ResNet, build_resnet, feature_dim
from .spatial_cnn import KDCrossTaskAttention, SpatialCNN
from .swin import SwinTransformer, build_swin, swin_feature_dim
from .tcn import TemporalTCN
from .tresnet import TResNet, build_tresnet

__all__ = [
    "Classifier", "GroupWiseLinear", "Mlp",
    "CvT", "build_cvt",
    "MSTCT",
    "MoCoEncoder", "MoCoQueue", "TERLModel",
    "EndToEndRecognizer",
    "load_backbone_variables", "warm_start_backbone",
    "fake_quant_convs", "fake_quant_kernel", "qat_params",
    "Q2L", "Q2LTransformer",
    "collect_dense_scales", "int8_apply", "quantize_dense_params",
    "make_int8_e2e", "quantize_resnet", "quantized_resnet_apply",
    "ResNet", "build_resnet", "feature_dim",
    "KDCrossTaskAttention", "SpatialCNN",
    "SwinTransformer", "build_swin", "swin_feature_dim",
    "TemporalTCN",
    "TResNet", "build_tresnet",
]

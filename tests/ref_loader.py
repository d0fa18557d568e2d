"""Standalone loader for /root/reference model code (torch CPU).

The reference package cannot be imported wholesale: its models/__init__.py
pulls in the CUDA MSDeformAttn extension, and torchvision / visdom are not
installed in this environment. This module

  * installs a minimal ``torchvision`` stub — ``ops.boxes`` (box_area /
    box_iou / nms / clip_boxes_to_image re-implemented to torchvision
    semantics) and ``models.resnet50/101`` (a faithful torch
    re-implementation of the torchvision Bottleneck ResNet with identical
    state-dict keys, stride-on-conv2 a.k.a. v1.5, and
    ``replace_stride_with_dilation`` support), plus a ``visdom`` stub;
  * loads the reference modules file-by-file into a synthetic
    ``ref_trackformer`` package so relative imports resolve without
    executing ``models/__init__``;
  * patches the CUDA-only ``MSDeformAttnFunction`` with the reference's own
    pure-PyTorch core (`ms_deform_attn_core_pytorch`,
    /root/reference/src/trackformer/models/ops/functions/
    ms_deform_attn_func.py:34-54) so the deformable path runs on CPU.

Used by the parity tests (tracker state machine, model forward through the
weight converter).
"""
import importlib.util
import sys
import types
from pathlib import Path

import torch
from torch import nn

REF = Path("/root/reference/src/trackformer")


# ---------------------------------------------------------------------------
# torchvision stub
# ---------------------------------------------------------------------------

def _box_area(b):
    return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])


def _box_iou(a, b):
    area1, area2 = _box_area(a), _box_area(b)
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[:, None] + area2[None, :] - inter)


def _nms(boxes, scores, iou_threshold):
    order = torch.argsort(scores, descending=True, stable=True)
    iou = _box_iou(boxes, boxes)
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    keep = []
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        suppressed |= iou[idx] > iou_threshold
        suppressed[idx] = True
    return torch.tensor(keep, dtype=torch.long)


def _clip_boxes_to_image(boxes, size):
    h, w = float(size[0]), float(size[1])
    out = boxes.clone()
    out[..., 0::2] = out[..., 0::2].clamp(0, w)
    out[..., 1::2] = out[..., 1::2].clamp(0, h)
    return out


class _Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on conv2), expansion 4."""
    expansion = 4

    def __init__(self, inplanes, planes, stride, downsample, dilation,
                 norm_layer):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn2 = norm_layer(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = norm_layer(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    def __init__(self, layers, norm_layer=None,
                 replace_stride_with_dilation=None, num_classes=1000,
                 **unused):
        super().__init__()
        if norm_layer is None:
            norm_layer = nn.BatchNorm2d
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self._norm_layer = norm_layer
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1, False)
        self.layer2 = self._make_layer(128, layers[1], 2,
                                       replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(256, layers[2], 2,
                                       replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(512, layers[3], 2,
                                       replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * 4, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")

    def _make_layer(self, planes, blocks, stride, dilate):
        norm_layer = self._norm_layer
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                norm_layer(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample,
                              previous_dilation, norm_layer)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(_Bottleneck(self.inplanes, planes, 1, None,
                                      self.dilation, norm_layer))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _resnet50(**kw):
    kw.pop("pretrained", None)
    return _ResNet([3, 4, 6, 3], **kw)


def _resnet101(**kw):
    kw.pop("pretrained", None)
    return _ResNet([3, 4, 23, 3], **kw)


class _IntermediateLayerGetter(nn.ModuleDict):
    """torchvision.models._utils.IntermediateLayerGetter semantics."""

    def __init__(self, model, return_layers):
        orig_return_layers = dict(return_layers)
        return_layers = {str(k): str(v) for k, v in return_layers.items()}
        layers = {}
        for name, module in model.named_children():
            layers[name] = module
            if name in return_layers:
                del return_layers[name]
            if not return_layers:
                break
        super().__init__(layers)
        self.return_layers = orig_return_layers

    def forward(self, x):
        from collections import OrderedDict
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def install_stubs():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.8.2"
        tv_models = types.ModuleType("torchvision.models")
        tv_models.resnet50 = _resnet50
        tv_models.resnet101 = _resnet101
        tv_utils = types.ModuleType("torchvision.models._utils")
        tv_utils.IntermediateLayerGetter = _IntermediateLayerGetter
        tv_models._utils = tv_utils
        tv_ops = types.ModuleType("torchvision.ops")
        tv_boxes = types.ModuleType("torchvision.ops.boxes")
        tv_boxes.box_area = _box_area
        tv_boxes.box_iou = _box_iou
        tv_boxes.nms = _nms
        tv_boxes.clip_boxes_to_image = _clip_boxes_to_image
        tv_fpn = types.ModuleType(
            "torchvision.ops.feature_pyramid_network")
        tv_fpn.FeaturePyramidNetwork = type("FeaturePyramidNetwork", (), {})
        tv_fpn.LastLevelMaxPool = type("LastLevelMaxPool", (), {})
        tv_misc = types.ModuleType("torchvision.ops.misc")
        tv_ops.boxes = tv_boxes
        tv_ops.feature_pyramid_network = tv_fpn
        tv_ops.misc = tv_misc
        tv.models = tv_models
        tv.ops = tv_ops
        for name, mod in [
                ("torchvision", tv), ("torchvision.models", tv_models),
                ("torchvision.models._utils", tv_utils),
                ("torchvision.ops", tv_ops),
                ("torchvision.ops.boxes", tv_boxes),
                ("torchvision.ops.feature_pyramid_network", tv_fpn),
                ("torchvision.ops.misc", tv_misc)]:
            sys.modules[name] = mod
    if "visdom" not in sys.modules:
        vis = types.ModuleType("visdom")

        class Visdom:  # noqa: D401 - attribute bag, never connected
            def __init__(self, *a, **k):
                pass

        vis.Visdom = Visdom
        sys.modules["visdom"] = vis
    if "MultiScaleDeformableAttention" not in sys.modules:
        sys.modules["MultiScaleDeformableAttention"] = types.ModuleType(
            "MultiScaleDeformableAttention")


# ---------------------------------------------------------------------------
# reference module loading
# ---------------------------------------------------------------------------

_cache = {}


def _load(name, path, search=None):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, path, submodule_search_locations=search)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _pkg(name, path):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    sys.modules[name] = mod
    return mod


class _CpuMSDAFunction:
    """Drop-in for the CUDA MSDeformAttnFunction using the reference's
    pure-PyTorch core (ms_deform_attn_func.py:34-54)."""

    core = None  # set by load_reference()

    @classmethod
    def apply(cls, value, spatial_shapes, sampling_locations,
              attention_weights, im2col_step):
        return cls.core(value, spatial_shapes, sampling_locations,
                        attention_weights)


def load_reference():
    """Load and return the reference modules as an attribute namespace."""
    if _cache:
        return _cache["ns"]
    install_stubs()
    _pkg("ref_trackformer", REF)
    _pkg("ref_trackformer.util", REF / "util")
    _pkg("ref_trackformer.models", REF / "models")

    ns = types.SimpleNamespace()
    ns.misc = _load("ref_trackformer.util.misc", REF / "util" / "misc.py")
    ns.box_ops = _load("ref_trackformer.util.box_ops",
                       REF / "util" / "box_ops.py")
    ns.position_encoding = _load("ref_trackformer.models.position_encoding",
                                 REF / "models" / "position_encoding.py")
    ns.backbone = _load("ref_trackformer.models.backbone",
                        REF / "models" / "backbone.py")
    ns.transformer = _load("ref_trackformer.models.transformer",
                           REF / "models" / "transformer.py")
    ns.matcher = _load("ref_trackformer.models.matcher",
                       REF / "models" / "matcher.py")
    ns.detr = _load("ref_trackformer.models.detr",
                    REF / "models" / "detr.py")
    ops_dir = REF / "models" / "ops"
    _pkg("ref_trackformer.models.ops", ops_dir)
    ns.msda_functions = _load(
        "ref_trackformer.models.ops.functions",
        ops_dir / "functions" / "__init__.py", [str(ops_dir / "functions")])
    ns.msda_modules = _load(
        "ref_trackformer.models.ops.modules",
        ops_dir / "modules" / "__init__.py", [str(ops_dir / "modules")])
    # CPU-run patch: swap the CUDA autograd.Function for the pytorch core
    _CpuMSDAFunction.core = staticmethod(
        ns.msda_functions.ms_deform_attn_core_pytorch)
    msda_mod = sys.modules["ref_trackformer.models.ops.modules"
                           ".ms_deform_attn"]
    msda_mod.MSDeformAttnFunction = _CpuMSDAFunction
    ns.deformable_transformer = _load(
        "ref_trackformer.models.deformable_transformer",
        REF / "models" / "deformable_transformer.py")
    ns.deformable_detr = _load("ref_trackformer.models.deformable_detr",
                               REF / "models" / "deformable_detr.py")
    ns.detr_tracking = _load("ref_trackformer.models.detr_tracking",
                             REF / "models" / "detr_tracking.py")
    ns.detr_segmentation = _load("ref_trackformer.models.detr_segmentation",
                                 REF / "models" / "detr_segmentation.py")
    ns.tracker = _load("ref_trackformer.models.tracker",
                       REF / "models" / "tracker.py")
    _cache["ns"] = ns
    return ns

"""Import shims for running the ACTUAL reference torch model on CPU.

The reference (/root/reference/src — read-only, public) depends on a few
packages not present in this environment: diffusers, pypose, pytorch3d,
omegaconf, e3nn, torchvision. Only a tiny slice of each is exercised by the
VicaSplat encoder forward:

  - diffusers: ModelMixin (an nn.Module base), ConfigMixin +
    @register_to_config (records __init__ args on self.config), RMSNorm
    (imported by backbone_vica.py:15 but never used).
  - pypose: SO3 quaternion containers used by src/misc/dq.py — storage is
    (x, y, z, w); SO3 * SO3 is rotation composition (Hamilton product);
    scalar arithmetic acts elementwise on the raw 4-vector; .matrix() is the
    unit-quaternion -> rotation-matrix map.
  - pytorch3d.transforms.matrix_to_quaternion: returns (w, x, y, z).
  - omegaconf.DictConfig: only used as a type annotation.
  - e3nn.o3: imported by sh_rotation.py but bypassed at runtime
    (reference gaussian_adapter.py:93-94 skips rotate_sh).
  - torchvision: imported by the vestigial resnet/dino backbones that the
    backbone registry pulls in; never instantiated.

install() is idempotent and must run before importing `src.*` from the
reference tree.
"""
from __future__ import annotations

import functools
import inspect
import sys
import types

import torch
import torch.nn as nn

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------- pypose ----
class LieTensor(torch.Tensor):
    @staticmethod
    def __new__(cls, data, *args, **kwargs):
        if not isinstance(data, torch.Tensor):
            data = torch.as_tensor(data)
        return torch.Tensor._make_subclass(cls, data)


class SO3(LieTensor):
    """Quaternion container, (x, y, z, w) storage like pypose SO3."""

    def __mul__(self, other):
        if isinstance(other, SO3):
            x1, y1, z1, w1 = self.tensor().unbind(-1)
            x2, y2, z2, w2 = other.tensor().unbind(-1)
            return SO3(torch.stack([
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            ], dim=-1))
        return torch.Tensor._make_subclass(torch.Tensor, self) * other

    def tensor(self):
        return torch.Tensor._make_subclass(torch.Tensor, self)

    def Inv(self):
        # pypose SO3.Inv(): quaternion conjugate (unit-quaternion inverse)
        x, y, z, w = self.tensor().unbind(-1)
        return SO3(torch.stack([-x, -y, -z, w], dim=-1))

    def matrix(self):
        x, y, z, w = self.tensor().unbind(-1)
        row0 = torch.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
        row1 = torch.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
        row2 = torch.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
        return torch.stack([row0, row1, row2], dim=-2)


def identity_SO3(*shape, **kwargs):
    q = torch.zeros(*shape, 4, **kwargs)
    q[..., 3] = 1.0
    return SO3(q)


# ------------------------------------------------------------- pytorch3d ----
def matrix_to_quaternion(matrix: torch.Tensor) -> torch.Tensor:
    """Rotation matrix -> (w, x, y, z) quaternion (pytorch3d convention:
    w kept non-negative via the stable branchless form)."""
    m = matrix
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    w = 0.5 * torch.sqrt(torch.clamp(1.0 + m00 + m11 + m22, min=1e-12))
    w4 = torch.clamp(4.0 * w, min=1e-8)
    x = (m[..., 2, 1] - m[..., 1, 2]) / w4
    y = (m[..., 0, 2] - m[..., 2, 0]) / w4
    z = (m[..., 1, 0] - m[..., 0, 1]) / w4
    return torch.stack([w, x, y, z], dim=-1)


# -------------------------------------------------------------- diffusers ---
class ModelMixin(nn.Module):
    def __getattr__(self, name):
        # diffusers ModelMixin falls back to config values for attribute
        # access (net.dec_depth -> net.config.dec_depth)
        try:
            return super().__getattr__(name)
        except AttributeError:
            d = self.__dict__.get("_internal_dict")
            if d is not None and name in d:
                return d[name]
            raise


class _FrozenDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e


class ConfigMixin:
    def register_to_config(self, **kwargs):
        d = getattr(self, "_internal_dict", _FrozenDict())
        d.update(kwargs)
        self._internal_dict = _FrozenDict(d)

    @property
    def config(self):
        return getattr(self, "_internal_dict", _FrozenDict())


def register_to_config(init):
    """Like diffusers': records the wrapped __init__'s args on self.config
    BEFORE running it, so the body can read self.config."""

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items()
               if k != "self" and not k.startswith("_")}
        cfg.pop("kwargs", None)
        ConfigMixin.register_to_config(self, **cfg)
        init(self, *args, **kwargs)

    return wrapper


class RMSNorm(nn.Module):  # imported by backbone_vica.py:15, never used
    def __init__(self, dim, eps=1e-6, elementwise_affine=True):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim)) if elementwise_affine else None

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        x = (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype)
        return x * self.weight if self.weight is not None else x


# ------------------------------------------------------------------ misc ----
class _StubModule(types.ModuleType):
    """Module whose unknown attributes resolve to inert placeholders, for
    imports of symbols that are never called (torchvision, e3nn.o3)."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)

        def _unavailable(*a, **k):
            raise NotImplementedError(
                f"{self.__name__}.{name} is a shim and cannot be called"
            )

        return _unavailable


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install():
    if "diffusers" in sys.modules:
        return
    sys.dont_write_bytecode = True

    diffusers = _module("diffusers")
    diffusers.models = _module("diffusers.models", ModelMixin=ModelMixin)
    _module("diffusers.models.normalization", RMSNorm=RMSNorm)
    _module(
        "diffusers.configuration_utils",
        ConfigMixin=ConfigMixin,
        register_to_config=register_to_config,
    )

    pypose = _module(
        "pypose",
        SO3=SO3,
        LieTensor=LieTensor,
        identity_SO3=identity_SO3,
    )
    pypose.lietensor = _module("pypose.lietensor")
    _module(
        "pypose.lietensor.lietensor",
        LieType=type("LieType", (), {}),
        SO3Type=SO3,
    )

    p3d = _module("pytorch3d")
    p3d.transforms = _module(
        "pytorch3d.transforms", matrix_to_quaternion=matrix_to_quaternion
    )

    class DictConfig(dict):
        pass

    _module("omegaconf", DictConfig=DictConfig, OmegaConf=None)

    import dataclasses

    class _DaciteConfig:
        def __init__(self, **kwargs):
            self.__dict__.update(kwargs)

    def _from_dict(data_class, data, config=None):
        names = {f.name for f in dataclasses.fields(data_class)}
        return data_class(**{k: v for k, v in data.items() if k in names})

    _module("dacite", Config=_DaciteConfig, from_dict=_from_dict)

    class LightningModule(nn.Module):
        pass

    _module("pyquaternion", Quaternion=type("Quaternion", (), {}))

    skvideo = _StubModule("skvideo")
    skvideo.__path__ = []
    sys.modules["skvideo"] = skvideo
    skio = _StubModule("skvideo.io")
    sys.modules["skvideo.io"] = skio
    skvideo.io = skio

    lightning = _StubModule("lightning")
    lightning.__path__ = []
    sys.modules["lightning"] = lightning
    lpt = _StubModule("lightning.pytorch")
    lpt.__path__ = []
    lpt.LightningModule = LightningModule
    sys.modules["lightning.pytorch"] = lpt
    lightning.pytorch = lpt
    lut = _StubModule("lightning.pytorch.utilities")
    lut.rank_zero_only = lambda fn: fn
    sys.modules["lightning.pytorch.utilities"] = lut
    lpt.utilities = lut

    e3nn = _module("e3nn")
    o3 = _StubModule("e3nn.o3")
    sys.modules["e3nn.o3"] = o3
    e3nn.o3 = o3

    tv = _StubModule("torchvision")
    tv.__path__ = []  # mark as package so `torchvision.*` submodules import
    sys.modules["torchvision"] = tv
    tvm = _StubModule("torchvision.models")
    tvm.ResNet = type("ResNet", (nn.Module,), {})
    sys.modules["torchvision.models"] = tvm
    tv.models = tvm
    tvt = _StubModule("torchvision.transforms")
    sys.modules["torchvision.transforms"] = tvt
    tv.transforms = tvt

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

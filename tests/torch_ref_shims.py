"""Pure-torch stand-ins for the reference's native deps so the *actual*
reference model code (/root/reference/genrobo3d/models/PointTransformerV3/)
can run on CPU for forward-parity tests: spconv (submanifold conv),
torch_scatter (segment_csr), timm (DropPath), addict/easydict (attr dicts).

The SubMConv3d emulation defines weight layout (out, k0, k1, k2, in) with
kernel offsets enumerated exactly like
robot3dlotus_tpu.ops.sparse_conv.stencil_offsets (dim0-major ascending,
centered), matching torch_convert's default spconv_layout='out_k_in'. Real
spconv checkpoints that use the transposed layout are handled by the
converter's `spconv_layout` flag; this shim pins down OUR convention so the
jax<->torch round trip is exact.

Call install() BEFORE importing the reference model module.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn


class AttrDict(dict):
    """Minimal addict.Dict / easydict.EasyDict: attribute-style item access."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for a in args:
            if a:
                for k, v in dict(a).items():
                    self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]

    # yacs-CfgNode surface used by the reference models (they defrost to
    # inject derived fields, simple_policy_ptv3.py:166-169)
    def freeze(self):
        pass

    def defrost(self):
        pass


class DropPath(nn.Module):
    """timm.models.layers.DropPath (per-sample stochastic depth)."""

    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask


def segment_csr(src, indptr, reduce="sum"):
    """torch_scatter.segment_csr on CPU via scatter_reduce."""
    counts = (indptr[1:] - indptr[:-1]).long()
    n_seg = counts.numel()
    index = torch.repeat_interleave(
        torch.arange(n_seg, device=src.device), counts)
    op = {"sum": "sum", "mean": "mean", "max": "amax", "min": "amin"}[reduce]
    out_shape = (n_seg,) + src.shape[1:]
    out = src.new_zeros(out_shape)
    idx = index.view(-1, *([1] * (src.ndim - 1))).expand_as(src)
    return out.scatter_reduce(0, idx, src, op, include_self=False)


class SparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size):
        self.features = features
        self.indices = indices            # (N, 1 + ndim) [batch, coords...]
        self.spatial_shape = spatial_shape
        self.batch_size = batch_size

    def replace_feature(self, features):
        return SparseConvTensor(features, self.indices, self.spatial_shape,
                                self.batch_size)


def _stencil_offsets(kernel_size):
    """Same enumeration as robot3dlotus_tpu.ops.sparse_conv.stencil_offsets."""
    r = kernel_size // 2
    rng = np.arange(-r, kernel_size - r)
    grid = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.int64)


class SubMConv3d(nn.Module):
    """Submanifold sparse conv: out[v] = sum_k W[k] @ feat[v + off_k] over
    active neighbors only; active-site set unchanged."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 padding=0, dilation=1, bias=True, indice_key=None, **kw):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        k = kernel_size
        self.weight = nn.Parameter(
            torch.empty(out_channels, k, k, k, in_channels))
        fan_in = in_channels * k ** 3
        bound = 1.0 / np.sqrt(fan_in)
        nn.init.uniform_(self.weight, -bound, bound)
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
            nn.init.uniform_(self.bias, -bound, bound)
        else:
            self.register_parameter("bias", None)

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        coords = x.indices.long()            # (N, 4): [b, g0, g1, g2]
        feats = x.features
        N = coords.shape[0]
        k = self.kernel_size
        offs = torch.from_numpy(_stencil_offsets(k))
        K = offs.shape[0]
        w = self.weight.reshape(self.out_channels, K, self.in_channels)

        span = int(coords[:, 1:].max().item()) + k + 2
        def keys_of(c):
            return ((c[:, 0] * span + c[:, 1]) * span + c[:, 2]) * span + c[:, 3]

        keys = keys_of(coords)
        sorted_keys, sort_idx = torch.sort(keys)

        out = feats.new_zeros(N, self.out_channels)
        for j in range(K):
            q = coords.clone()
            q[:, 1:] = coords[:, 1:] + offs[j]
            valid = (q[:, 1:] >= 0).all(-1)
            qk = keys_of(q.clamp(min=0))
            pos = torch.searchsorted(sorted_keys, qk).clamp(max=N - 1)
            found = (sorted_keys[pos] == qk) & valid
            nbr = sort_idx[pos]
            contrib = feats[nbr] @ w[:, j, :].T
            out = out + torch.where(found[:, None], contrib,
                                    torch.zeros_like(contrib))
        if self.bias is not None:
            out = out + self.bias
        return x.replace_feature(out)


def _is_spconv_module(module):
    return isinstance(module, SubMConv3d)


def _spec(mod):
    """Synthetic modules need a __spec__: transformers probes optional deps
    with importlib.util.find_spec, which raises on spec-less sys.modules
    entries."""
    import importlib.machinery
    mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, loader=None)
    return mod


def install():
    """Register the shim modules in sys.modules (idempotent)."""
    if "spconv" in sys.modules and not hasattr(
            sys.modules["spconv"], "_robot3dlotus_shim"):
        return  # real spconv present; don't clobber

    addict_mod = types.ModuleType("addict")
    addict_mod.Dict = AttrDict
    sys.modules["addict"] = _spec(addict_mod)

    easydict_mod = types.ModuleType("easydict")
    easydict_mod.EasyDict = AttrDict
    sys.modules["easydict"] = _spec(easydict_mod)

    timm_mod = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath

    def trunc_normal_(tensor, std=1.0, mean=0.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    timm_layers.trunc_normal_ = trunc_normal_
    timm_mod.models = timm_models
    timm_models.layers = timm_layers
    sys.modules["timm"] = _spec(timm_mod)
    sys.modules["timm.models"] = _spec(timm_models)
    sys.modules["timm.models.layers"] = _spec(timm_layers)

    ts_mod = types.ModuleType("torch_scatter")
    ts_mod.segment_csr = segment_csr
    sys.modules["torch_scatter"] = _spec(ts_mod)

    spconv_mod = types.ModuleType("spconv")
    spconv_mod._robot3dlotus_shim = True
    spconv_pytorch = types.ModuleType("spconv.pytorch")
    spconv_pytorch.SparseConvTensor = SparseConvTensor
    spconv_pytorch.SubMConv3d = SubMConv3d
    spconv_modules = types.ModuleType("spconv.pytorch.modules")
    spconv_modules.is_spconv_module = _is_spconv_module
    spconv_pytorch.modules = spconv_modules
    spconv_mod.pytorch = spconv_pytorch
    sys.modules["spconv"] = _spec(spconv_mod)
    sys.modules["spconv.pytorch"] = _spec(spconv_pytorch)
    sys.modules["spconv.pytorch.modules"] = _spec(spconv_modules)


def import_reference_model():
    """install() shims, put /root/reference on sys.path, and import the
    reference PTv3 package. Returns (model_module, model_ca_module)."""
    install()
    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    from genrobo3d.models.PointTransformerV3 import model as ref_model
    from genrobo3d.models.PointTransformerV3 import model_ca as ref_model_ca
    return ref_model, ref_model_ca

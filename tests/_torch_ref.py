"""Test-only loader for the reference PyTorch modules at /root/reference.

The parity suite (test_torch_parity.py) instantiates the ACTUAL reference
torch modules on CPU at tiny configs, exports their state dicts through
ckpt/torch_import.py, and asserts forward-output agreement with the flax
models. The reference imports `timm` (not installed here), so a minimal
shim providing the three symbols the model code uses
(`timm.models.layers.{DropPath, to_2tuple, trunc_normal_}`) is installed
first; DropPath is identity because all parity runs are eval-mode /
drop_path=0.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"


def install_timm_shim():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as tnn

    timm = types.ModuleType("timm")
    timm.__version__ = "0.3.2"  # reference main_*.py:18-19 asserts this
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    utils_mod = types.ModuleType("timm.utils")
    loss_mod = types.ModuleType("timm.loss")

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode parity only
            return x

    def accuracy(output, target, topk=(1,)):
        # timm.utils.accuracy (0.3.2): top-k accuracy percentages
        maxk = max(topk)
        batch_size = target.size(0)
        _, pred = output.topk(maxk, 1, True, True)
        pred = pred.t()
        correct = pred.eq(target.reshape(1, -1).expand_as(pred))
        return [
            correct[:k].reshape(-1).float().sum(0) * 100.0 / batch_size
            for k in topk
        ]

    class LabelSmoothingCrossEntropy(tnn.Module):
        # timm.loss.LabelSmoothingCrossEntropy (0.3.2)
        def __init__(self, smoothing=0.1):
            super().__init__()
            self.smoothing = smoothing
            self.confidence = 1.0 - smoothing

        def forward(self, x, target):
            logprobs = torch.nn.functional.log_softmax(x, dim=-1)
            nll_loss = -logprobs.gather(
                dim=-1, index=target.unsqueeze(1)
            ).squeeze(1)
            smooth_loss = -logprobs.mean(dim=-1)
            loss = self.confidence * nll_loss + self.smoothing * smooth_loss
            return loss.mean()

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    utils_mod.accuracy = accuracy
    loss_mod.LabelSmoothingCrossEntropy = LabelSmoothingCrossEntropy
    timm.models = models
    timm.utils = utils_mod
    timm.loss = loss_mod
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
    sys.modules["timm.utils"] = utils_mod
    sys.modules["timm.loss"] = loss_mod


def install_main_shims():
    """Extra stubs so the reference ENTRY POINTS import: ptflops (only the
    commented-out FLOP counter references it), clip (loaded in-loop only
    for adj-n/con-n, which the trajectory tests don't run), and
    timm.optim.optim_factory (main_finetune_semseg.py:19 imports it but the
    mains build param groups via lrd.param_groups_lrd, never optim_factory;
    the shimmed `timm` is a plain module, not a package, so the submodules
    must be pre-registered in sys.modules)."""
    install_timm_shim()
    if "timm.optim.optim_factory" not in sys.modules:
        timm = sys.modules["timm"]
        optim_mod = types.ModuleType("timm.optim")
        factory_mod = types.ModuleType("timm.optim.optim_factory")
        optim_mod.optim_factory = factory_mod
        timm.optim = optim_mod
        sys.modules["timm.optim"] = optim_mod
        sys.modules["timm.optim.optim_factory"] = factory_mod
    if "ptflops" not in sys.modules:
        ptflops = types.ModuleType("ptflops")

        def get_model_complexity_info(*a, **k):
            raise NotImplementedError("ptflops shim: not used in tests")

        ptflops.get_model_complexity_info = get_model_complexity_info
        sys.modules["ptflops"] = ptflops
    if "clip" not in sys.modules:
        import torch

        clip = types.ModuleType("clip")

        class _ShimClipModel:
            def encode_image(self, *a, **k):
                raise NotImplementedError(
                    "clip shim: in-loop encoding not under test"
                )

        def load(*a, **k):
            # dataset constructors keep only the preprocess; return a dummy
            # transform so the -n datasets can be instantiated
            return _ShimClipModel(), (lambda img: torch.zeros(3, 224, 224))

        clip.load = load
        sys.modules["clip"] = clip


def load_reference():
    """Make `model.*` / `utils.*` of the reference importable."""
    install_timm_shim()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)


def ref_args(**overrides):
    """Minimal stand-in for the reference argparse namespace."""
    ns = types.SimpleNamespace(
        phase="finetune_cls",
        pr_phase="rec",
        masking_strategy="density",
        use_feature_fusion=True,
        sample_mode="bilinear",
        backbone_type="vit",
        model_size="small",
        num_bins=5,
        num_classes=6,
        drop_rate=0.0,
        attn_drop_rate=0.0,
        drop_path_rate=0.0,
    )
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns


def sd_numpy(module) -> dict:
    """state_dict -> {key: np.ndarray} (the shape load_torch_state_dict
    produces after file round-trip, minus file IO)."""
    import numpy as np

    return {
        k: np.asarray(v.detach().cpu().numpy())
        for k, v in module.state_dict().items()
    }


def nhwc(x_torch):
    """torch NCHW tensor -> numpy NHWC."""
    import numpy as np

    return np.ascontiguousarray(
        x_torch.detach().cpu().numpy().transpose(0, 2, 3, 1)
    )

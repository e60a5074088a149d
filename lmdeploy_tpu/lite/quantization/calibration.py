"""Calibration runner over a torch HF causal-LM.

Reference: lmdeploy/lite/quantization/calibration.py CalibrationContext —
hooks every target linear's INPUT and records per-layer past-K/V extrema
while streaming calibration batches through the model on CPU.

Differences: stats land in numpy dicts (exported as .npz), and K/V come
from ``use_cache=True`` outputs instead of per-layer monkey-patching."""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .awq import FC_FCS_MAP, NORM_FCS_MAP, _family
from .observer import ActivationObserver, KVCacheObserver


def target_linear_names(model_name: str, num_layers: int,
                        layer_prefix: str = 'model.layers') -> List[str]:
    fam = _family(model_name)
    rel = set()
    for fcs in NORM_FCS_MAP[fam].values():
        rel.update(fcs)
    for fc, fcs in FC_FCS_MAP[fam].items():
        rel.add(fc)
        rel.update(fcs)
    return [f'{layer_prefix}.{i}.{r}'
            for i in range(num_layers) for r in sorted(rel)]


class CalibrationContext:
    """Collects activation + KV stats for one HF model.

    Usage::
        ctx = CalibrationContext(model, model_name)
        with ctx:
            for batch in loader:
                ctx.step(batch)          # torch LongTensor [B, S]
        np.savez(..., **ctx.export())
    """

    def __init__(self, model, model_name: str, num_kv_heads: int = None,
                 head_dim: int = None):
        import torch  # noqa: F401
        self.model = model
        self.model_name = model_name
        cfg = model.config
        self.num_layers = cfg.num_hidden_layers
        self.num_kv_heads = num_kv_heads or getattr(
            cfg, 'num_key_value_heads', cfg.num_attention_heads)
        self.head_dim = head_dim or (cfg.hidden_size
                                     // cfg.num_attention_heads)
        self.act_observers: Dict[str, ActivationObserver] = {}
        self.key_observers = [KVCacheObserver(self.num_kv_heads,
                                              self.head_dim)
                              for _ in range(self.num_layers)]
        self.value_observers = [KVCacheObserver(self.num_kv_heads,
                                                self.head_dim)
                                for _ in range(self.num_layers)]
        self._handles = []

    def __enter__(self):
        import torch.nn as nn
        names = set(target_linear_names(self.model_name, self.num_layers))
        for name, mod in self.model.named_modules():
            if name in names and isinstance(mod, nn.Linear):
                obs = ActivationObserver(mod.in_features)
                self.act_observers[name] = obs

                def hook(module, args, _obs=obs):
                    x = args[0].detach().float().cpu().numpy()
                    _obs.observe(x.reshape(-1, x.shape[-1]))

                self._handles.append(mod.register_forward_pre_hook(hook))
        return self

    def __exit__(self, *exc):
        for h in self._handles:
            h.remove()
        self._handles = []

    def step(self, input_ids) -> None:
        import torch
        with torch.no_grad():
            out = self.model(input_ids, use_cache=True)
        pkv = out.past_key_values
        for i in range(self.num_layers):
            k, v = pkv[i][0], pkv[i][1]
            self.key_observers[i].observe(k.detach().float().cpu().numpy())
            self.value_observers[i].observe(v.detach().float().cpu().numpy())

    def export(self) -> Dict[str, np.ndarray]:
        """Flat dict for np.savez: inputs/<name>/<stat>, keys/<i>/<stat>,
        values/<i>/<stat> (reference writes inputs_stats.pth,
        key_stats.pth, value_stats.pth)."""
        out: Dict[str, np.ndarray] = {}
        for name, obs in self.act_observers.items():
            for stat, val in obs.stats().items():
                out[f'inputs/{name}/{stat}'] = val
        for i in range(self.num_layers):
            for stat, val in self.key_observers[i].stats().items():
                out[f'keys/{i}/{stat}'] = val
            for stat, val in self.value_observers[i].stats().items():
                out[f'values/{i}/{stat}'] = val
        return out


def load_stats(path: str):
    """Inverse of CalibrationContext.export (reads the .npz)."""
    z = np.load(path)
    inputs: Dict[str, Dict[str, np.ndarray]] = {}
    keys: Dict[int, Dict[str, np.ndarray]] = {}
    values: Dict[int, Dict[str, np.ndarray]] = {}
    for k in z.files:
        kind, name, stat = k.split('/', 2)
        if kind == 'inputs':
            inputs.setdefault(name, {})[stat] = z[k]
        elif kind == 'keys':
            keys.setdefault(int(name), {})[stat] = z[k]
        elif kind == 'values':
            values.setdefault(int(name), {})[stat] = z[k]
    return inputs, keys, values


__all__ = ['CalibrationContext', 'target_linear_names', 'load_stats']

"""Quantization toolkit ("lite"): AWQ W4A16 + KV-INT8 calibration.

Reference: lmdeploy/lite/ — apis (calibrate, auto_awq, kv_qparams),
quantization (awq smoothing, calibration, observers)."""
from .apis.auto_awq import auto_awq
from .apis.calibrate import calibrate
from .apis.kv_qparams import kv_qparams

__all__ = ['auto_awq', 'calibrate', 'kv_qparams']

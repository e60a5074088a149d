# Copyright (c) lmdeploy-tpu authors. TPU-native rebuild of LMDeploy's
# capability surface (reference: lmdeploy/version.py).
__version__ = '0.1.0'

version_info = tuple(int(x) for x in __version__.split('.'))

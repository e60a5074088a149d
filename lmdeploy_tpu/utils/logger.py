"""Leveled logger (reference: src/turbomind/utils/logger.cc — TM_LOG_LEVEL
env, TM_LOG_FIRST_RANK_ONLY).  Env vars: LMDEPLOY_TPU_LOG_LEVEL
(TRACE|DEBUG|INFO|WARNING|ERROR) and LMDEPLOY_TPU_LOG_FIRST_RANK_ONLY
(suppress logs on jax.process_index() != 0 for multi-host runs)."""
from __future__ import annotations

import logging
import os

TRACE = 5
logging.addLevelName(TRACE, 'TRACE')

_LEVELS = {'TRACE': TRACE, 'DEBUG': logging.DEBUG, 'INFO': logging.INFO,
           'WARNING': logging.WARNING, 'ERROR': logging.ERROR}


def get_logger(name: str = 'lmdeploy_tpu') -> logging.Logger:
    logger = logging.getLogger(name)
    if getattr(logger, '_lmdeploy_tpu_init', False):
        return logger
    logger._lmdeploy_tpu_init = True
    level = _LEVELS.get(os.environ.get('LMDEPLOY_TPU_LOG_LEVEL',
                                       'WARNING').upper(), logging.WARNING)
    logger.setLevel(level)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            '[lmdeploy-tpu][%(levelname)s] %(asctime)s %(message)s',
            datefmt='%H:%M:%S'))
        logger.addHandler(h)
    if os.environ.get('LMDEPLOY_TPU_LOG_FIRST_RANK_ONLY', '0') == '1':
        try:
            import jax
            if jax.process_index() != 0:
                logger.setLevel(logging.ERROR)
        except Exception:
            pass
    return logger


__all__ = ['get_logger', 'TRACE']

"""Test configuration: force JAX onto a virtual 8-device CPU platform so
mesh/sharding tests run without TPU hardware (SURVEY.md §4 implication).

Note: a sitecustomize in this image force-registers the 'axon' TPU plugin
and pins JAX_PLATFORMS=axon in the environment, so plain env-var defaults
are not enough — we must override the jax config in-process before any
backend initializes.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

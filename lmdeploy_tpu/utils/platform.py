"""Platform selection helpers.

This image's sitecustomize force-registers the 'axon' TPU plugin and
pins JAX_PLATFORMS in the environment, so the env var alone cannot move
a process to CPU — the jax config must be overridden in-process BEFORE
any backend initializes (tests/conftest.py does the same dance).  CPU
runs matter operationally: the accuracy/ppl harnesses are CPU-sized,
and a host whose chip is busy (e.g. a background autotune holding the
single tunneled device) must not block on TPU client creation.
"""


def force_cpu_platform(virtual_devices: int = 0) -> None:
    """Pin this process to the CPU backend; call before first jax use.

    Args:
      virtual_devices: if >0, expose that many virtual CPU devices
        (``--xla_force_host_platform_device_count``) for mesh tests.
    """
    import os
    if virtual_devices:
        flags = os.environ.get('XLA_FLAGS', '')
        if '--xla_force_host_platform_device_count' not in flags:
            os.environ['XLA_FLAGS'] = (
                f'{flags} --xla_force_host_platform_device_count='
                f'{virtual_devices}').strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')


__all__ = ['force_cpu_platform']

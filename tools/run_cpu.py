"""PLATFORM-WA(relay-init): run a script on the local CPU backend even when the TPU relay is dead.

The session's sitecustomize registers the axon PJRT plugin in every
interpreter; when the relay is down, ANY ``jax.devices()`` — even with
``JAX_PLATFORMS=cpu`` in the env — blocks trying to initialize it.  The
working recipe (same as tests/conftest.py) is the config knob plus a
backend reset BEFORE the first devices() call.  This wrapper applies it
and then runs the target script:

    python tools/run_cpu.py examples/quickstart.py [args...]
    python tools/run_cpu.py -d 8 examples/multichip.py   # 8 virtual devices
"""
import os
import runpy
import sys


def main():
    argv = sys.argv[1:]
    ndev = 1
    if argv and argv[0] == "-d":
        ndev = int(argv[1])
        argv = argv[2:]
    if not argv:
        sys.exit(__doc__)

    if ndev > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={ndev}"
            ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as jeb

        jeb.clear_backends()
    except Exception:  # pragma: no cover - older jax
        jax.clear_backends()
    assert jax.devices()[0].platform == "cpu"

    script = argv[0]
    sys.argv = argv
    sys.path.insert(0, os.path.dirname(os.path.abspath(script)))
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()

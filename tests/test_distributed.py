"""Multi-host bootstrap tests (subprocess-based, fake 2-process pod).

The reference's distributed.py is dead code (DeepSolid/distributed.py:28-55,
never imported; README.md:92-94 says multi-node unsupported). Ours must
actually work, so we exercise a real 2-process jax.distributed bootstrap
over localhost gRPC on CPU.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent(
    """
    import sys

    import jax

    # config update (not backend init): beats any preinstalled TPU plugin
    jax.config.update("jax_platforms", "cpu")
    from deepsolid_tpu.parallel import distributed

    coord, pid = sys.argv[1], int(sys.argv[2])
    distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2 * jax.local_device_count()
    print("BOOTSTRAP_OK", pid)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cpu_env():
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # the session sitecustomize force-registers the remote-TPU PJRT
    # plugin when this is set; with the tunnel down, backend init in the
    # child hangs past the test timeout
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


@pytest.mark.slow
def test_two_process_bootstrap():
    coord = f"127.0.0.1:{_free_port()}"
    env = _cpu_env()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, coord, str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed:\n{out}\n{err}"
        assert "BOOTSTRAP_OK" in out


def test_explicit_request_fails_loudly_after_backend_init():
    """If the backend was already touched, an explicit multi-host request
    must raise, not silently run single-host."""
    code = textwrap.dedent(
        """
        import jax

        jax.devices()  # initializes the backend -> bootstrap now impossible
        from deepsolid_tpu.parallel import distributed

        try:
            distributed.initialize(
                coordinator_address="127.0.0.1:1",
                num_processes=2,
                process_id=0,
            )
        except RuntimeError as e:
            assert "explicitly requested" in str(e), e
            print("RAISED_LOUDLY")
        else:
            print("SILENT_NOOP")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=_cpu_env(),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "RAISED_LOUDLY" in out.stdout, out.stdout


def test_single_host_initialize_is_noop():
    code = textwrap.dedent(
        """
        from deepsolid_tpu.parallel import distributed

        distributed.initialize()
        import jax

        assert jax.process_count() == 1
        print("NOOP_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=_cpu_env(),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "NOOP_OK" in out.stdout

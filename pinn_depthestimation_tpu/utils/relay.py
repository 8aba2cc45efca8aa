"""Dead-relay detection for the remote-TPU tunnel.

In this environment the TPU chip is reached through a local relay process
(``/root/.tpu_init.py``) that listens on a fixed set of localhost ports and
forwards bytes to the real TPU host. The relay has NO supervisor: if its
process dies, every JAX op hangs for ~30 minutes and then fails with
``Unable to initialize backend 'axon': UNAVAILABLE``. That failure mode is
fatal for unattended entry points (``bench.py``, the driver's
``__graft_entry__`` compile check, the CLI): they would burn half an hour
and produce nothing.

This module detects the dead-relay state *cheaply and before any JAX
backend initialization* — the only point at which it can still be avoided:
``JAX_PLATFORMS=''`` does not help (axon plugin discovery still hangs), and
once backend init has started there is no way back. The one working escape
is ``jax.config.update("jax_platforms", "cpu")`` BEFORE the first backend
touch (the same pin tests/conftest.py uses).

Detection is deliberately conservative: the relay is declared dead only when
(a) this machine actually carries the tunnel marker script (so on any other
machine — a real local TPU, plain CPU CI — this module is a no-op), and
(b) none of the relay's listener ports accept a TCP connection. A live but
wedged relay (ports open, traffic stalled) is NOT treated as dead: that
state is transient and recovers, per the measured history in CLAUDE.md.
"""

from __future__ import annotations

import ast
import os
import re
import socket

# The relay script doubles as the environment marker: it exists exactly on
# machines that reach the TPU through the tunnel.
RELAY_MARKER = "/root/.tpu_init.py"

# Fallback listener ports if the marker script can't be parsed; the real
# list is read from the script's ``PORTS = [...]`` line when available.
DEFAULT_PORTS = (8082, 8083, 8087, 8092)


def _relay_ports(marker: str) -> tuple[int, ...]:
    try:
        with open(marker, "r") as f:
            head = f.read(4096)
        m = re.search(r"^PORTS\s*=\s*(\[[^\]]*\])", head, re.MULTILINE)
        if m:
            ports = tuple(int(p) for p in ast.literal_eval(m.group(1)))
            if ports:
                return ports
    except Exception:
        pass
    return DEFAULT_PORTS


def tpu_relay_alive(
    marker: str = RELAY_MARKER, *, timeout: float = 0.5
) -> bool | None:
    """Whether the TPU tunnel relay is accepting connections.

    Returns ``None`` when this machine does not use the tunnel at all (no
    marker script) — callers must treat that as "don't interfere", not as
    dead. Returns True/False otherwise.
    """
    if not os.path.exists(marker):
        return None
    for port in _relay_ports(marker):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=timeout):
                return True
        except OSError:
            continue
    return False


def pin_cpu_if_relay_dead(marker: str = RELAY_MARKER) -> bool:
    """Pin the CPU backend iff the tunnel relay is provably dead.

    Must be called before any JAX backend initialization (importing jax is
    fine; creating an array is not). Returns True only when the dead-relay
    state was detected AND the process is actually on the CPU backend
    (pinned here, or already initialized as CPU) — callers use the return
    to tag their output (e.g. the bench record's metric tag) so a
    CPU-fallback number is never mistaken for a TPU measurement, and that
    tag must never be attached while ops still target the dead backend.
    """
    if tpu_relay_alive(marker) is not False:
        return False
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        return True
    except RuntimeError:
        # Backend already initialized — the pin can no longer take effect.
        # Honest answer: True only if the initialized backend is CPU.
        try:
            return jax.default_backend() == "cpu"
        except Exception:  # pragma: no cover - backend init itself failing
            return False

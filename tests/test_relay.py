"""Dead-relay detection (utils/relay.py).

The TPU tunnel relay has no supervisor; when it dies, unattended entry
points (bench.py, __graft_entry__, the CLI) must pin the CPU backend
instead of hanging ~30 min on axon backend init. These tests drive the
detector through synthetic marker files so they are independent of whether
the real relay on this machine is up.
"""

import socket
import threading

from pinn_depthestimation_tpu.utils import relay


def _marker(tmp_path, ports):
    p = tmp_path / "tpu_init.py"
    p.write_text(f"PORTS = {list(ports)}\n\nimport socket\n")
    return str(p)


def test_no_marker_means_not_a_tunnel_machine(tmp_path):
    missing = str(tmp_path / "nope.py")
    assert relay.tpu_relay_alive(missing) is None
    # pin_cpu must be a no-op on machines without the tunnel (a real local
    # TPU would otherwise be silently demoted to CPU)
    assert relay.pin_cpu_if_relay_dead(missing) is False


def test_alive_when_a_listed_port_accepts(tmp_path):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    accepted = []

    def _accept():
        try:
            c, _ = srv.accept()
            accepted.append(True)
            c.close()
        except OSError:
            pass

    t = threading.Thread(target=_accept, daemon=True)
    t.start()
    try:
        marker = _marker(tmp_path, [port])
        assert relay.tpu_relay_alive(marker) is True
        assert relay.pin_cpu_if_relay_dead(marker) is False
    finally:
        srv.close()
        t.join(timeout=2)


def test_dead_when_no_listed_port_accepts(tmp_path):
    # Grab a free port and close it so nothing listens there.
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    marker = _marker(tmp_path, [port])
    assert relay.tpu_relay_alive(marker) is False
    # Under the test suite the CPU backend is already pinned+initialized;
    # the pin call must still report the dead state without raising.
    assert relay.pin_cpu_if_relay_dead(marker) is True


def test_port_parse_falls_back_on_garbage(tmp_path):
    p = tmp_path / "tpu_init.py"
    p.write_text("this is not python PORTS at all\n")
    assert relay._relay_ports(str(p)) == relay.DEFAULT_PORTS
    assert relay._relay_ports(str(tmp_path / "missing.py")) == relay.DEFAULT_PORTS


def test_real_machine_marker_parses():
    # On this machine the marker exists; the parser must extract its PORTS
    # line (regression guard for the relay script's format).
    import os

    if not os.path.exists(relay.RELAY_MARKER):  # pragma: no cover
        return
    ports = relay._relay_ports(relay.RELAY_MARKER)
    assert len(ports) >= 1 and all(1 <= p <= 65535 for p in ports)

"""network_gui: loopback client speaking the reference wire protocol
(4-byte LE length + JSON in; raw RGB bytes + LE length + verify out)."""
import json
import socket

import numpy as np

from f3d_gaus_tpu.utils.network_gui import NetworkGUI, parse_request


def _request(width=8, height=6):
    wv = np.eye(4, dtype=np.float32)
    fp = np.eye(4, dtype=np.float32)
    return {
        "resolution_x": width, "resolution_y": height, "train": True,
        "fov_x": 0.6, "fov_y": 0.6, "z_near": 0.2, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": wv.reshape(-1).tolist(),
        "view_projection_matrix": fp.reshape(-1).tolist(),
    }


def _send_msg(sock, obj):
    payload = json.dumps(obj).encode("utf-8")
    sock.sendall(len(payload).to_bytes(4, "little"))
    sock.sendall(payload)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        buf += sock.recv(n - len(buf))
    return buf


def test_round_trip_render():
    gui = NetworkGUI(port=0)             # ephemeral port
    client = socket.create_connection(("127.0.0.1", gui.port))
    try:
        gui.poll(lambda cam: None)       # accept the connection

        served = {}

        def render(cam):
            served.update(cam)
            img = np.zeros((3, cam["height"], cam["width"]), np.float32)
            img[0] = 1.0                 # pure red
            return img

        _send_msg(client, _request(8, 6))
        assert gui.poll(render, verify="path/to/model", timeout=5.0) is True
        assert served["width"] == 8 and served["height"] == 6
        # viewer column flips applied (network_gui.py:75-78 contract)
        np.testing.assert_array_equal(served["world_view"][:, 1],
                                      [0, -1, 0, 0])
        img_bytes = _recv_exact(client, 8 * 6 * 3)
        img = np.frombuffer(img_bytes, np.uint8).reshape(6, 8, 3)
        assert (img[..., 0] == 255).all() and (img[..., 1:] == 0).all()
        n = int.from_bytes(_recv_exact(client, 4), "little")
        assert _recv_exact(client, n) == b"path/to/model"
    finally:
        client.close()
        gui.close()


def test_keep_alive_ping_has_no_image():
    gui = NetworkGUI(port=0)
    client = socket.create_connection(("127.0.0.1", gui.port))
    try:
        gui.poll(lambda cam: None)
        ping = _request(0, 0)            # 0x0 resolution = ping
        _send_msg(client, ping)
        assert gui.poll(lambda cam: (_ for _ in ()).throw(
            AssertionError("render_fn must not run for pings")),
            verify="ok", timeout=5.0) is True
        n = int.from_bytes(_recv_exact(client, 4), "little")
        assert _recv_exact(client, n) == b"ok"
    finally:
        client.close()
        gui.close()


def test_poll_never_blocks_without_viewer():
    gui = NetworkGUI(port=0)
    try:
        assert gui.poll(lambda cam: None) is False
    finally:
        gui.close()


def test_parse_request_fields():
    cam = parse_request(_request(16, 12))
    assert cam["width"] == 16 and cam["height"] == 12
    assert cam["scaling_modifier"] == 1.0
    assert cam["world_view"].shape == (4, 4)
    assert parse_request(_request(0, 0)) is None

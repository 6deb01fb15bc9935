"""UR protocol clients against a loopback fake UR controller (socket-level tests).

The reference's urx layer has no tests at all (SURVEY §4); here a fake controller
serves the secondary (30002-style) and realtime (30003-style) streams and consumes
URScript programs, so the full client stack is exercised without hardware.
"""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from voxactb_tpu.realrobot import urscript as urs
from voxactb_tpu.realrobot.monitor import RealtimeMonitor, SecondaryMonitor
from voxactb_tpu.realrobot.robot import (
    BimanualURRobot,
    URRobot,
    axis_angle_to_quat,
    quat_to_axis_angle,
)


class FakeURController:
    """Serves secondary + realtime streams; executes movel by teleporting the TCP."""

    def __init__(self):
        self.q = np.zeros(6)
        self.tcp = np.array([0.3, 0.0, 0.4, 0.0, 3.14, 0.0])
        self.programs = []
        self._stop = threading.Event()
        self._lock = threading.Lock()

        self.sec_srv = socket.create_server(("127.0.0.1", 0))
        self.rt_srv = socket.create_server(("127.0.0.1", 0))
        self.sec_port = self.sec_srv.getsockname()[1]
        self.rt_port = self.rt_srv.getsockname()[1]
        threading.Thread(target=self._sec_loop, daemon=True).start()
        threading.Thread(target=self._rt_loop, daemon=True).start()

    # -- secondary ------------------------------------------------------------------

    def _robot_state_packet(self) -> bytes:
        with self._lock:
            q, tcp = self.q.copy(), self.tcp.copy()
        # RobotModeData (subtype 0): ts(8) + 7 bools + mode
        mode = struct.pack(">Q", 0) + bytes([1, 1, 1, 0, 0, 1, 0, 7])
        mode_pkg = struct.pack(">i", 5 + len(mode)) + bytes([0]) + mode
        # JointData (subtype 1): 6 records of 41 bytes (q, q_target, qd + 17 pad)
        jd = b""
        for j in range(6):
            jd += struct.pack(">ddd", q[j], q[j], 0.0) + bytes(17)
        jd_pkg = struct.pack(">i", 5 + len(jd)) + bytes([1]) + jd
        # CartesianInfo (subtype 4): 6 doubles
        ci = struct.pack(">6d", *tcp)
        ci_pkg = struct.pack(">i", 5 + len(ci)) + bytes([4]) + ci
        payload = bytes([16]) + mode_pkg + jd_pkg + ci_pkg
        return struct.pack(">i", 4 + len(payload)) + payload

    def _sec_loop(self):
        conn, _ = self.sec_srv.accept()
        conn.settimeout(0.05)
        buf = b""
        while not self._stop.is_set():
            try:
                conn.sendall(self._robot_state_packet())
            except OSError:
                return
            try:
                data = conn.recv(65536)
                if data:
                    buf += data
                    while b"\n" in buf:
                        line, buf = buf.split(b"\n", 1)
                        self._execute(line.decode())
            except socket.timeout:
                pass
            except OSError:
                return
            time.sleep(0.02)

    def _execute(self, program: str) -> None:
        self.programs.append(program)
        if program.startswith("movel(p["):
            vals = [float(v) for v in
                    program.split("[")[1].split("]")[0].split(",")]
            with self._lock:
                self.tcp = np.array(vals)
        elif program.startswith("movej(["):
            vals = [float(v) for v in
                    program.split("[")[1].split("]")[0].split(",")]
            with self._lock:
                self.q = np.array(vals)

    # -- realtime -------------------------------------------------------------------

    def _rt_packet(self) -> bytes:
        with self._lock:
            q, tcp = self.q.copy(), self.tcp.copy()
        doubles = np.zeros(131)  # 1052-byte CB3-ish layout
        doubles[0] = time.time() % 1e6
        # hard-code the DOCUMENTED UR realtime layout (time + 5 six-vectors
        # before q_actual; tool_vector_actual at double 55) instead of reusing
        # the parser's constants — a parser offset bug must fail this test
        doubles[31:37] = q
        doubles[55:61] = tcp
        payload = struct.pack(f">{len(doubles)}d", *doubles)
        return struct.pack(">i", 4 + len(payload)) + payload

    def _rt_loop(self):
        conn, _ = self.rt_srv.accept()
        while not self._stop.is_set():
            try:
                conn.sendall(self._rt_packet())
            except OSError:
                return
            time.sleep(0.01)

    def stop(self):
        self._stop.set()
        self.sec_srv.close()
        self.rt_srv.close()


@pytest.fixture
def controller():
    c = FakeURController()
    yield c
    c.stop()


def test_secondary_monitor_parses_state(controller):
    mon = SecondaryMonitor("127.0.0.1", controller.sec_port)
    state = mon.get_state(wait=True)
    assert state.is_power_on and state.is_program_running
    np.testing.assert_allclose(state.tcp_pose, controller.tcp, atol=1e-9)
    assert state.joint_positions.shape == (6,)
    mon.close()


def test_realtime_monitor_parses_stream(controller):
    mon = RealtimeMonitor("127.0.0.1", controller.rt_port)
    time.sleep(0.2)
    np.testing.assert_allclose(mon.tcp_pose(), controller.tcp, atol=1e-9)
    assert mon.timestamp() > 0
    mon.close()


def test_urrobot_movel_roundtrip(controller):
    robot = URRobot("127.0.0.1", secondary_port=controller.sec_port,
                    realtime_port=controller.rt_port)
    target = [0.4, 0.1, 0.3, 0.0, 3.14, 0.0]
    robot.movel(target, wait=True, timeout=5.0)
    np.testing.assert_allclose(robot.get_pose()[:3], target[:3], atol=1e-6)
    assert any(p.startswith("movel") for p in controller.programs)
    robot.close()


def test_urrobot_gripper_and_csys(controller):
    robot = URRobot("127.0.0.1", secondary_port=controller.sec_port,
                    realtime_port=controller.rt_port)
    robot.gripper_activate()
    robot.gripper_set(0.0)  # close
    time.sleep(0.3)
    joined = "\n".join(controller.programs)
    assert 'socket_set_var("ACT", 1' in joined
    assert '"POS", 255' in joined

    # user csys shifts commanded poses into base coordinates
    csys = np.eye(4)
    csys[:3, 3] = [1.0, 0.0, 0.0]
    robot.set_csys(csys)
    robot.movel([0.0, 0.0, 0.5, 0, 3.14, 0], wait=True, timeout=5.0)
    raw = controller.tcp
    np.testing.assert_allclose(raw[:3], [1.0, 0.0, 0.5], atol=1e-6)
    # and get_pose maps back into the user frame
    np.testing.assert_allclose(robot.get_pose()[:3], [0.0, 0.0, 0.5], atol=1e-4)
    robot.close()


def test_axis_angle_quat_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    rv = quat_to_axis_angle(q)
    back = axis_angle_to_quat(rv)
    assert abs(np.dot(back, q)) > 1 - 1e-6


def test_bimanual_facade(controller):
    c2 = FakeURController()
    try:
        bot = BimanualURRobot(
            URRobot("127.0.0.1", controller.sec_port, controller.rt_port),
            URRobot("127.0.0.1", c2.sec_port, c2.rt_port),
        )
        bot.move_arm("right", [0.4, -0.1, 0.3], [0, 0, 0, 1], gripper_open=1.0,
                     wait=True)
        obs = bot.observation()
        assert "gripper_right_pose" in obs and "gripper_left_pose" in obs
        np.testing.assert_allclose(
            obs["gripper_right_pose"][:3], [0.4, -0.1, 0.3], atol=1e-4)
        bot.close()
    finally:
        c2.stop()

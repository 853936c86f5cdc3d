"""Native MAVLink codec + UDP autopilot handshake tests.

The scripted endpoint below plays the aircraft side of the reference's
waypoint protocol (msl/trajectory.py:121-140) over a real UDP socket —
deterministic SITL-free coverage of the exact message flow.
"""

import socket
import struct
import threading
import time

import pytest

from tol_tpu.mission import mavlink as mv
from tol_tpu.mission.autopilot import haversine_enu


def test_x25_crc_known_vector():
    """MCRF4XX check value ("123456789" -> 0x6F91) — the checksum MAVLink
    specifies (X.25 without output inversion)."""
    assert mv.x25_crc(b"123456789") == 0x6F91


def test_pack_parse_roundtrip():
    p = mv.Parser()
    frames = (
        mv.pack(mv.HEARTBEAT, (0, 2, 3, 81, 4, 3)) +
        mv.pack(mv.GLOBAL_POSITION_INT,
                (1234, 401451000, -1052408000, 1676000, 105000, 1, -2, 3, 90)) +
        mv.pack(mv.MISSION_REQUEST, (7, 255, 190))
    )
    # push in dribbles to exercise resync/partial-frame handling
    out = []
    for i in range(0, len(frames), 5):
        out.extend(p.push(frames[i:i + 5]))
    ids = [m for m, _ in out]
    assert ids == [mv.HEARTBEAT, mv.GLOBAL_POSITION_INT, mv.MISSION_REQUEST]
    gpi = dict(zip(ids, [v for _, v in out]))[mv.GLOBAL_POSITION_INT]
    assert gpi[1] == 401451000 and gpi[3] == 1676000
    # corrupt a byte: frame must be dropped, stream must resync
    bad = bytearray(mv.pack(mv.MISSION_CURRENT, (3,)))
    bad[7] ^= 0xFF
    assert mv.Parser().push(bytes(bad)) == []


class ScriptedAircraft(threading.Thread):
    """Aircraft-side endpoint: heartbeat reply, GPS stream, mission
    request/ack handshake recording every uploaded item."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(0.1)
        self.port = self.sock.getsockname()[1]
        self.items = []
        self.cleared = False
        self.current = None
        self.stop = threading.Event()
        self.parser = mv.Parser()

    def run(self):
        peer = None
        expected = 0
        while not self.stop.is_set():
            try:
                data, addr = self.sock.recvfrom(4096)
            except socket.timeout:
                continue
            peer = addr
            for msgid, vals in self.parser.push(data):
                if msgid == mv.HEARTBEAT:
                    self.sock.sendto(mv.pack(mv.HEARTBEAT, (0, 1, 3, 81, 4, 3),
                                             sysid=1), peer)
                    self.sock.sendto(mv.pack(
                        mv.GLOBAL_POSITION_INT,
                        (1, 401466300, -1052396740, 1781000, 105000,
                         0, 0, 0, 0), sysid=1), peer)
                elif msgid == mv.MISSION_CLEAR_ALL:
                    self.cleared = True
                    self.items = []
                elif msgid == mv.MISSION_COUNT:
                    expected = vals[0]
                    self.sock.sendto(mv.pack(mv.MISSION_REQUEST,
                                             (0, 255, 190), sysid=1), peer)
                elif msgid == mv.MISSION_ITEM:
                    self.items.append(vals)
                    nxt = len(self.items)
                    if nxt < expected:
                        self.sock.sendto(mv.pack(mv.MISSION_REQUEST,
                                                 (nxt, 255, 190), sysid=1),
                                         peer)
                    else:
                        self.sock.sendto(mv.pack(mv.MISSION_ACK,
                                                 (255, 190, 0), sysid=1),
                                         peer)
                elif msgid == mv.MISSION_SET_CURRENT:
                    self.current = vals[0]
                    self.sock.sendto(mv.pack(mv.MISSION_CURRENT, (vals[0],),
                                             sysid=1), peer)


def test_autopilot_against_scripted_endpoint():
    ac = ScriptedAircraft()
    ac.start()
    ap = mv.MavlinkAutopilot(conn=f"127.0.0.1:{ac.port}")
    try:
        assert ap.connect(timeout_s=3.0)
        lat, lon, alt = ap.global_position()
        assert lat == pytest.approx(40.14663) and alt == pytest.approx(1781.0)
        wps = [{"lat": 40.1451 + 1e-4 * k, "lon": -105.2408, "alt": 70.0,
                "speed": 15.0} for k in range(3)]
        n = ap.upload_mission(wps)
        assert n == 3
        assert ac.cleared
        assert len(ac.items) == 6          # waypoint + speed pair each
        cmds = [it[8] for it in ac.items]
        assert cmds[0::2] == [mv.MAV_CMD_NAV_WAYPOINT] * 3
        assert cmds[1::2] == [mv.MAV_CMD_DO_CHANGE_SPEED] * 3
        assert ac.items[1][1] == pytest.approx(15.0)   # speed param2
        assert ac.current == 1
    finally:
        ac.stop.set()
        ap.close()

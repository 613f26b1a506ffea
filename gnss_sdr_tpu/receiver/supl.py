"""SUPL A-GNSS client: network assistance for warm/hot starts.

Counterpart of the reference's SUPL subsystem
(/root/reference/src/core/libs/gnss_sdr_supl_client.{h,cc} +
control_thread.cc assist_GNSS, control_thread.h:151): connect to a SUPL
server, run the OMA ULP session flow

    SUPL START -> SUPL RESPONSE -> SUPL POS INIT -> SUPL POS -> SUPL END

and decode the RRLP assistance payload (3GPP TS 44.031 GPS-assistance
semantics: reference time, reference location, ionospheric model, UTC
model, navigation model) into the receiver's assistance store — the same
classes the XML warm-start path persists (receiver/assistance.py).

Wire format: the reference links ~73k lines of generated ASN.1 PER; this
client speaks a compact bit-packed ULP profile with the SAME message
flow, session-ID echo rules and RRLP field widths/scalings as the GPS
ICD (navigation-model fields are the LNAV subframe-1/2/3 quantities at
their ICD LSBs). The transport codec is symmetric (MockSuplServer in
tests/test_supl.py drives it end-to-end over real sockets, optionally
TLS); full ASN.1 PER interop with third-party servers is out of scope in
this zero-egress environment and documented as such.
"""

from __future__ import annotations

import dataclasses
import socket
import struct

from gnss_sdr_tpu.monitor.rtcm import BitReader, BitWriter
from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris

ULP_VERSION = (1, 0, 0)

#: ULP message types (OMA-TS-ULP UlpMessage choice order)
MSG_SUPL_START = 1
MSG_SUPL_RESPONSE = 2
MSG_SUPL_POS_INIT = 3
MSG_SUPL_POS = 4
MSG_SUPL_END = 5

#: requested-assistance bitmap (SUPL POS INIT requestedAssistData)
REQ_NAVIGATION_MODEL = 1 << 0
REQ_IONO = 1 << 1
REQ_UTC = 1 << 2
REQ_REF_TIME = 1 << 3
REQ_REF_LOCATION = 1 << 4
REQ_ALMANAC = 1 << 5

#: RRLP navigation-model field layout: (name, bits, scale, signed) at the
#: GPS LNAV ICD LSBs (IS-GPS-200 20.3.3.3/4) — what TS 44.031's
#: NavModelElement carries per satellite.
_NAV_FIELDS = [
    ("week_number", 10, 1.0, False),
    ("sv_health", 6, 1.0, False),
    ("iodc", 10, 1.0, False),
    ("tgd_s", 8, 2.0**-31, True),
    ("toc_s", 16, 16.0, False),
    ("af2", 8, 2.0**-55, True),
    ("af1", 16, 2.0**-43, True),
    ("af0", 22, 2.0**-31, True),
    ("crs_m", 16, 2.0**-5, True),
    ("delta_n_rad_s", 16, 2.0**-43 * 3.1415926535898, True),
    ("m0_rad", 32, 2.0**-31 * 3.1415926535898, True),
    ("cuc_rad", 16, 2.0**-29, True),
    ("ecc", 32, 2.0**-33, False),
    ("cus_rad", 16, 2.0**-29, True),
    ("sqrt_a", 32, 2.0**-19, False),
    ("toe_s", 16, 16.0, False),
    ("cic_rad", 16, 2.0**-29, True),
    ("omega0_rad", 32, 2.0**-31 * 3.1415926535898, True),
    ("cis_rad", 16, 2.0**-29, True),
    ("i0_rad", 32, 2.0**-31 * 3.1415926535898, True),
    ("crc_m", 16, 2.0**-5, True),
    ("omega_rad", 32, 2.0**-31 * 3.1415926535898, True),
    ("omega_dot_rad_s", 24, 2.0**-43 * 3.1415926535898, True),
    ("idot_rad_s", 14, 2.0**-43 * 3.1415926535898, True),
]


@dataclasses.dataclass
class AssistanceData:
    """What assist_GNSS delivers to the receiver."""

    ephemerides: dict[int, GpsEphemeris] = dataclasses.field(
        default_factory=dict)
    iono_alpha: tuple | None = None
    iono_beta: tuple | None = None
    utc_a0: float = 0.0
    utc_a1: float = 0.0
    ref_time_tow_s: float | None = None
    ref_time_week: int | None = None
    ref_lat_deg: float | None = None
    ref_lon_deg: float | None = None


# ---------------------------------------------------------------------------
# message codecs
# ---------------------------------------------------------------------------


def _frame(msg_type: int, session_id: int, body: bytes) -> bytes:
    """ULP envelope: length(2) version(3) session(4) type(1) body."""
    payload = struct.pack(
        ">BBBIB", *ULP_VERSION, session_id & 0xFFFFFFFF, msg_type) + body
    return struct.pack(">H", len(payload) + 2) + payload


def _read_frame(sock) -> tuple[int, int, bytes]:
    head = _recv_exact(sock, 2)
    total = struct.unpack(">H", head)[0]
    rest = _recv_exact(sock, total - 2)
    maj, _minor, _serv, session_id, msg_type = struct.unpack(
        ">BBBIB", rest[:8])
    if maj != ULP_VERSION[0]:
        raise ValueError(f"unsupported ULP version {maj}")
    return msg_type, session_id, rest[8:]


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("SUPL peer closed the connection")
        buf += chunk
    return buf


def encode_navigation_model(ephs: dict[int, GpsEphemeris]) -> bytes:
    """RRLP NavigationModel IE (server side / test mock)."""
    w = BitWriter()
    w.u(len(ephs), 6)
    for prn in sorted(ephs):
        e = ephs[prn]
        w.u(prn, 6)
        for name, bits, scale, signed in _NAV_FIELDS:
            v = getattr(e, name)
            iv = int(round(v / scale))
            if signed:
                w.s(iv, bits)
            else:
                w.u(iv, bits)
    return w.to_bytes()


def decode_navigation_model(data: bytes) -> dict[int, GpsEphemeris]:
    r = BitReader(data)
    n = r.u(6)
    out: dict[int, GpsEphemeris] = {}
    for _ in range(n):
        prn = r.u(6)
        fields = {}
        for name, bits, scale, signed in _NAV_FIELDS:
            iv = r.s(bits) if signed else r.u(bits)
            fields[name] = iv * scale
        fields["week_number"] = int(fields["week_number"])
        fields["iodc"] = int(fields["iodc"])
        fields["iode"] = int(fields["iodc"]) & 0xFF
        fields["sv_health"] = int(fields["sv_health"])
        out[prn] = GpsEphemeris.from_fields(prn, fields)
    return out


def encode_assistance(data: AssistanceData) -> bytes:
    """RRLP assistanceData payload of a SUPL POS message."""
    w = BitWriter()
    present = 0
    if data.ephemerides:
        present |= REQ_NAVIGATION_MODEL
    if data.iono_alpha is not None:
        present |= REQ_IONO
    if data.utc_a0 or data.utc_a1:
        present |= REQ_UTC
    if data.ref_time_tow_s is not None:
        present |= REQ_REF_TIME
    if data.ref_lat_deg is not None:
        present |= REQ_REF_LOCATION
    w.u(present, 8)
    if present & REQ_NAVIGATION_MODEL:
        nav = encode_navigation_model(data.ephemerides)
        w.u(len(nav), 16)
        for byte in nav:
            w.u(byte, 8)
    if present & REQ_IONO:
        # 8 x 8-bit signed at the Klobuchar LSBs (IS-GPS-200 20.3.3.5.1.7)
        for v, scale in zip(data.iono_alpha,
                            (2.0**-30, 2.0**-27, 2.0**-24, 2.0**-24)):
            w.s(int(round(v / scale)), 8)
        for v, scale in zip(data.iono_beta,
                            (2.0**11, 2.0**14, 2.0**16, 2.0**16)):
            w.s(int(round(v / scale)), 8)
    if present & REQ_UTC:
        w.s(int(round(data.utc_a0 / 2.0**-30)), 32)
        w.s(int(round(data.utc_a1 / 2.0**-50)), 24)
    if present & REQ_REF_TIME:
        w.u(data.ref_time_week, 10)
        w.u(int(round(data.ref_time_tow_s / 0.08)), 23)  # GSM frame ticks
    if present & REQ_REF_LOCATION:
        w.s(int(round(data.ref_lat_deg / (90.0 / 2**23))), 24)
        w.s(int(round(data.ref_lon_deg / (360.0 / 2**24))), 25)
    return w.to_bytes()


def decode_assistance(payload: bytes) -> AssistanceData:
    r = BitReader(payload)
    present = r.u(8)
    out = AssistanceData()
    if present & REQ_NAVIGATION_MODEL:
        n = r.u(16)
        nav = bytes(r.u(8) for _ in range(n))
        out.ephemerides = decode_navigation_model(nav)
    if present & REQ_IONO:
        out.iono_alpha = tuple(
            r.s(8) * s for s in (2.0**-30, 2.0**-27, 2.0**-24, 2.0**-24))
        out.iono_beta = tuple(
            r.s(8) * s for s in (2.0**11, 2.0**14, 2.0**16, 2.0**16))
    if present & REQ_UTC:
        out.utc_a0 = r.s(32) * 2.0**-30
        out.utc_a1 = r.s(24) * 2.0**-50
    if present & REQ_REF_TIME:
        out.ref_time_week = r.u(10)
        out.ref_time_tow_s = r.u(23) * 0.08
    if present & REQ_REF_LOCATION:
        out.ref_lat_deg = r.s(24) * (90.0 / 2**23)
        out.ref_lon_deg = r.s(25) * (360.0 / 2**24)
    return out


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class SuplClient:
    """SUPL session driver (gnss_sdr_supl_client::get_assistance role)."""

    def __init__(self, host: str, port: int = 7275,
                 use_tls: bool = False, timeout_s: float = 10.0,
                 requested: int = (REQ_NAVIGATION_MODEL | REQ_IONO
                                   | REQ_UTC | REQ_REF_TIME
                                   | REQ_REF_LOCATION)):
        self.host = host
        self.port = port
        self.use_tls = use_tls
        self.timeout_s = timeout_s
        self.requested = requested

    def fetch_assistance(self, session_id: int = 1) -> AssistanceData:
        sock = socket.create_connection((self.host, self.port),
                                        timeout=self.timeout_s)
        if self.use_tls:
            import ssl

            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE  # SUPL servers use private CAs
            sock = ctx.wrap_socket(sock, server_hostname=self.host)
        try:
            return self._run_session(sock, session_id)
        finally:
            sock.close()

    def _run_session(self, sock, session_id: int) -> AssistanceData:
        sock.sendall(_frame(MSG_SUPL_START, session_id, b"\x00"))
        msg, sid, _ = _read_frame(sock)
        if msg != MSG_SUPL_RESPONSE or sid != session_id:
            raise ValueError(f"expected SUPL RESPONSE, got {msg}/{sid}")
        body = struct.pack(">B", self.requested)
        sock.sendall(_frame(MSG_SUPL_POS_INIT, session_id, body))
        assistance = AssistanceData()
        while True:
            msg, sid, payload = _read_frame(sock)
            if sid != session_id:
                raise ValueError("session id mismatch")
            if msg == MSG_SUPL_POS:
                got = decode_assistance(payload)
                assistance.ephemerides.update(got.ephemerides)
                for attr in ("iono_alpha", "iono_beta", "ref_time_tow_s",
                             "ref_time_week", "ref_lat_deg", "ref_lon_deg"):
                    v = getattr(got, attr)
                    if v is not None:
                        setattr(assistance, attr, v)
                if got.utc_a0 or got.utc_a1:
                    assistance.utc_a0 = got.utc_a0
                    assistance.utc_a1 = got.utc_a1
            elif msg == MSG_SUPL_END:
                return assistance
            else:
                raise ValueError(f"unexpected ULP message {msg}")


class SuplPerClient:
    """SUPL 1.0 session over real ASN.1 UPER — wire-compatible with
    standard SUPL servers (the gnss_sdr_supl_client.cc:1-1063 role,
    byte-validated against the reference's own asn1c encoder in
    tests/test_supl_per.py).

    Flow (proxy mode, SET-initiated): SUPLSTART -> SUPLRESPONSE ->
    SUPLPOSINIT(requestedAssistData) -> SUPLPOS* (RRLP assistanceData,
    each acknowledged) -> SUPLEND.
    """

    def __init__(self, host: str, port: int = 7275,
                 imsi: str = "240010123456789",
                 mcc: int = 244, mnc: int = 5, lac: int = 0x59e2,
                 ci: int = 0x3284, use_tls: bool = False,
                 timeout_s: float = 10.0):
        self.host = host
        self.port = port
        self.imsi = imsi
        self.cell = dict(refMCC=mcc, refMNC=mnc, refLAC=lac, refCI=ci)
        self.use_tls = use_tls
        self.timeout_s = timeout_s

    # -- wire helpers ------------------------------------------------------
    @staticmethod
    def _read_pdu(sock) -> dict:
        from gnss_sdr_tpu.receiver.supl_messages import decode_ulp

        head = _recv_exact(sock, 2)
        total = struct.unpack(">H", head)[0]
        body = _recv_exact(sock, total - 2)
        return decode_ulp(head + body)

    def _set_session(self, session_id: int) -> dict:
        from gnss_sdr_tpu.receiver.supl_messages import imsi_bcd

        return {"setSessionID": {"sessionId": session_id,
                                 "setId": {"imsi": imsi_bcd(self.imsi)}}}

    def _capabilities(self) -> dict:
        return {
            "posTechnology": {
                "agpsSETassisted": True, "agpsSETBased": True,
                "autonomousGPS": False, "aFLT": False, "eCID": False,
                "eOTD": False, "oTDOA": False},
            "prefMethod": 1,        # agpsSETBasedPreferred
            "posProtocol": {"tia801": False, "rrlp": True, "rrc": False},
        }

    def _location_id(self) -> dict:
        return {"cellInfo": {"gsmCell": dict(self.cell)}, "status": 1}

    # -- session -----------------------------------------------------------
    def fetch_assistance(self, session_id: int = 1) -> AssistanceData:
        sock = socket.create_connection((self.host, self.port),
                                        timeout=self.timeout_s)
        if self.use_tls:
            import ssl

            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
            sock = ctx.wrap_socket(sock, server_hostname=self.host)
        try:
            return self._run_session(sock, session_id)
        finally:
            sock.close()

    def _run_session(self, sock, session_id: int) -> AssistanceData:
        from gnss_sdr_tpu.receiver.supl_messages import (
            decode_rrlp, encode_rrlp, encode_ulp,
            ephemeris_from_uncompressed)

        version = {"maj": 1, "min": 0, "servind": 0}
        sock.sendall(encode_ulp({
            "version": version, "sessionID": self._set_session(session_id),
            "message": {"msSUPLSTART": {
                "sETCapabilities": self._capabilities(),
                "locationId": self._location_id()}}}))
        resp = self._read_pdu(sock)
        if "msSUPLRESPONSE" not in resp["message"]:
            raise ValueError(f"expected SUPLRESPONSE, got "
                             f"{list(resp['message'])}")
        # echo the server's slpSessionID in all subsequent messages
        session = dict(self._set_session(session_id))
        slp = resp["sessionID"].get("slpSessionID")
        if slp is not None:
            session["slpSessionID"] = slp
        sock.sendall(encode_ulp({
            "version": version, "sessionID": session,
            "message": {"msSUPLPOSINIT": {
                "sETCapabilities": self._capabilities(),
                "requestedAssistData": {
                    "almanacRequested": False, "utcModelRequested": True,
                    "ionosphericModelRequested": True,
                    "dgpsCorrectionsRequested": False,
                    "referenceLocationRequested": True,
                    "referenceTimeRequested": True,
                    "acquisitionAssistanceRequested": False,
                    "realTimeIntegrityRequested": False,
                    "navigationModelRequested": True},
                "locationId": self._location_id()}}}))
        assistance = AssistanceData()
        while True:
            pdu = self._read_pdu(sock)
            msg = pdu["message"]
            if "msSUPLEND" in msg:
                return assistance
            if "msSUPLPOS" not in msg:
                raise ValueError(f"unexpected ULP message {list(msg)}")
            payload = msg["msSUPLPOS"]["posPayLoad"].get("rrlpPayload")
            if payload is None:
                continue
            rrlp = decode_rrlp(bytes(payload))
            comp = rrlp["component"]
            body = comp.get("assistanceData") \
                or comp.get("msrPositionReq")
            if body is None:
                continue
            gps = body.get("gps-AssistData")
            if gps is not None:
                self._consume_control_header(gps["controlHeader"],
                                             assistance,
                                             ephemeris_from_uncompressed)
            # acknowledge the assistance component (RRLP ack)
            ack = encode_rrlp({
                "referenceNumber": rrlp["referenceNumber"],
                "component": {"assistanceDataAck": None}})
            sock.sendall(encode_ulp({
                "version": version, "sessionID": session,
                "message": {"msSUPLPOS": {
                    "posPayLoad": {"rrlpPayload": ack}}}}))

    @staticmethod
    def _consume_control_header(ch: dict, assistance: AssistanceData,
                                eph_from) -> None:
        nav = ch.get("navigationModel")
        if nav is not None:
            for el in nav["navModelList"]:
                st = el["satStatus"]
                fields = st.get("newSatelliteAndModelUC") \
                    or st.get("newNaviModelUC")
                if fields is not None:
                    eph = eph_from(el["satelliteID"], fields)
                    assistance.ephemerides[eph.prn] = eph
        iono = ch.get("ionosphericModel")
        if iono is not None:
            assistance.iono_alpha = tuple(
                iono[f"alfa{k}"] * s for k, s in
                enumerate((2.0 ** -30, 2.0 ** -27, 2.0 ** -24,
                           2.0 ** -24)))
            assistance.iono_beta = tuple(
                iono[f"beta{k}"] * s for k, s in
                enumerate((2.0 ** 11, 2.0 ** 14, 2.0 ** 16, 2.0 ** 16)))
        utc = ch.get("utcModel")
        if utc is not None:
            assistance.utc_a0 = utc["utcA0"] * 2.0 ** -30
            assistance.utc_a1 = utc["utcA1"] * 2.0 ** -50
        rt = ch.get("referenceTime")
        if rt is not None:
            assistance.ref_time_tow_s = \
                rt["gpsTime"]["gpsTOW23b"] * 0.08
            assistance.ref_time_week = rt["gpsTime"]["gpsWeek"]
        loc = ch.get("refLocation")
        if loc is not None:
            geo = bytes(loc["threeDLocation"])
            # 3GPP 23.032 ellipsoid point (type 0/1/8/9): 24-bit
            # lat (sign+23), 24-bit two's-complement lon
            if len(geo) >= 7:
                lat_raw = int.from_bytes(geo[1:4], "big")
                sign = -1.0 if lat_raw & 0x800000 else 1.0
                lat = sign * (lat_raw & 0x7FFFFF) * 90.0 / 2 ** 23
                lon_raw = int.from_bytes(geo[4:7], "big", signed=False)
                if lon_raw & 0x800000:
                    lon_raw -= 1 << 24
                lon = lon_raw * 360.0 / 2 ** 24
                assistance.ref_lat_deg = lat
                assistance.ref_lon_deg = lon

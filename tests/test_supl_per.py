"""SUPL/RRLP ASN.1 UPER codec vs reference-encoder byte fixtures.

The fixture hex strings below were produced by compiling the
reference's OWN asn1c-generated codec
(/root/reference/src/core/libs/supl/asn-supl, asn-rrlp, types) with a
small driver that fills the same structures supl.c builds and calls
``uper_encode_to_buffer`` (the supl_ulp_encode flow, supl.c:75-100):

    gcc -O0 -w -fcommon -Iasn-supl -Itypes gen.c asn-supl/*.c types/*.c
    ./gen   # prints the PER bytes

so byte-for-byte agreement here is real on-the-wire interoperability
with the reference SUPL client/server stack.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver import supl_messages as sm

# ULP SUPLSTART: version 1.0.0, setSessionID(1, imsi
# 21436587092143F5), SETCapabilities(assisted+based, SETBased-pref,
# rrlp), gsmCell(244, 5, 23010, 12932), status=current
FIX_SUPLSTART = bytes.fromhex(
    "001b01000080004c850d961c24850fd44302400f40156788ca1080")
# ULP SUPLRESPONSE: same SET session + slpSessionID(DEADBEEF,
# ipv4 192.168.1.77), posMethod=agpsSETassisted
FIX_SUPLRESPONSE = bytes.fromhex(
    "001a010000c0004c850d961c24850fd77ab6fbbc605400a69000")
# ULP SUPLEND: statusCode=unspecified
FIX_SUPLEND = bytes.fromhex("001201000080004c850d961c24850fd54800")
# RRLP assistanceData: refNumber 2, referenceTime(1234567, 876),
# iono(10,-5,-3,2 / 90,32,-96,-96), utc(100,-20000,111,120,18,137,7,18),
# navigationModel sat 6 newSatelliteAndModelUC(...)
FIX_RRLP_ASSIST = bytes.fromhex(
    "44127012d687db0060800b280000000000000000000003b00e140400bb20f570"
    "9a56d60f14865d6fd7e0178c29d21c3421aec00038404005dd6f3458bffa5325"
    "4ed9534a0115801cbf937ebe4514f6fb05b54040410000c8ffff63c0def12513"
    "0f24")

_EPH_FIX = dict(
    ephemCodeOnL2=1, ephemURA=0, ephemSVhealth=0, ephemIODC=357,
    ephemL2Pflag=0,
    ephemSF1Rsvd=dict(reserved1=0, reserved2=0, reserved3=0, reserved4=0),
    ephemTgd=-10, ephemToc=450, ephemAF2=0, ephemAF1=23,
    ephemAF0=-456789, ephemCrs=1234, ephemDeltaN=14000,
    ephemM0=-123456789, ephemCuc=-321, ephemE=12345678, ephemCus=4321,
    ephemAPowerHalf=2702013952, ephemToe=450, ephemFitFlag=0,
    ephemAODA=0, ephemCic=11, ephemOmegaA0=987654321, ephemCis=-12,
    ephemI0=642424242, ephemCrc=9876, ephemW=-2111111111,
    ephemOmegaADot=-55555, ephemIDot=-222)


def _suplstart_value():
    return {
        "version": {"maj": 1, "min": 0, "servind": 0},
        "sessionID": {"setSessionID": {
            "sessionId": 1,
            "setId": {"imsi": sm.imsi_bcd("123456789012345")}}},
        "message": {"msSUPLSTART": {
            "sETCapabilities": {
                "posTechnology": {
                    "agpsSETassisted": True, "agpsSETBased": True,
                    "autonomousGPS": False, "aFLT": False, "eCID": False,
                    "eOTD": False, "oTDOA": False},
                "prefMethod":
                    sm.PREF_METHOD_NAMES.index("agpsSETBasedPreferred"),
                "posProtocol": {"tia801": False, "rrlp": True,
                                "rrc": False}},
            "locationId": {
                "cellInfo": {"gsmCell": {
                    "refMCC": 244, "refMNC": 5, "refLAC": 23010,
                    "refCI": 12932}},
                "status": 1}}},   # current
    }


def test_suplstart_matches_reference_bytes():
    assert sm.encode_ulp(_suplstart_value()) == FIX_SUPLSTART


def test_suplstart_roundtrip():
    out = sm.decode_ulp(FIX_SUPLSTART)
    assert out["length"] == len(FIX_SUPLSTART)
    st = out["message"]["msSUPLSTART"]
    assert st["sETCapabilities"]["posProtocol"]["rrlp"] is True
    cell = st["locationId"]["cellInfo"]["gsmCell"]
    assert (cell["refMCC"], cell["refLAC"]) == (244, 23010)
    imsi = out["sessionID"]["setSessionID"]["setId"]["imsi"]
    assert imsi == sm.imsi_bcd("123456789012345")


def test_suplresponse_decodes_reference_bytes():
    out = sm.decode_ulp(FIX_SUPLRESPONSE)
    resp = out["message"]["msSUPLRESPONSE"]
    assert sm.POS_METHOD_NAMES[resp["posMethod"]] == "agpsSETassisted"
    slp = out["sessionID"]["slpSessionID"]
    assert slp["sessionID"] == bytes.fromhex("deadbeef")
    assert slp["slpId"]["iPAddress"]["ipv4Address"] == bytes(
        [192, 168, 1, 77])


def test_suplend_decodes_reference_bytes():
    out = sm.decode_ulp(FIX_SUPLEND)
    end = out["message"]["msSUPLEND"]
    assert sm.STATUS_CODE_NAMES[end["statusCode"]] == "unspecified"
    assert "position" not in end


def test_rrlp_assistance_decodes_reference_bytes():
    pdu = sm.decode_rrlp(FIX_RRLP_ASSIST)
    assert pdu["referenceNumber"] == 2
    ad = pdu["component"]["assistanceData"]
    ch = ad["gps-AssistData"]["controlHeader"]
    assert ch["referenceTime"]["gpsTime"] == {
        "gpsTOW23b": 1234567, "gpsWeek": 876}
    iono = ch["ionosphericModel"]
    assert (iono["alfa0"], iono["alfa1"], iono["beta2"]) == (10, -5, -96)
    utc = ch["utcModel"]
    assert (utc["utcA0"], utc["utcDeltaTls"]) == (-20000, 18)
    el = ch["navigationModel"]["navModelList"][0]
    assert el["satelliteID"] == 6
    eph_fields = el["satStatus"]["newSatelliteAndModelUC"]
    assert eph_fields == _EPH_FIX


def test_rrlp_assistance_encode_matches_reference_bytes():
    pdu = {
        "referenceNumber": 2,
        "component": {"assistanceData": {
            "gps-AssistData": {"controlHeader": {
                "referenceTime": {"gpsTime": {"gpsTOW23b": 1234567,
                                              "gpsWeek": 876}},
                "ionosphericModel": dict(alfa0=10, alfa1=-5, alfa2=-3,
                                         alfa3=2, beta0=90, beta1=32,
                                         beta2=-96, beta3=-96),
                "utcModel": dict(utcA1=100, utcA0=-20000, utcTot=111,
                                 utcWNt=120, utcDeltaTls=18, utcWNlsf=137,
                                 utcDN=7, utcDeltaTlsf=18),
                "navigationModel": {"navModelList": [{
                    "satelliteID": 6,
                    "satStatus": {
                        "newSatelliteAndModelUC": dict(_EPH_FIX)},
                }]},
            }}}},
    }
    assert sm.encode_rrlp(pdu) == FIX_RRLP_ASSIST


def test_rrlp_ephemeris_scaling_roundtrip():
    """UncompressedEphemeris -> GpsEphemeris -> back reproduces the ICD
    integers, and the resulting orbit evaluates sanely."""
    eph = sm.ephemeris_from_uncompressed(6, _EPH_FIX)
    assert eph.prn == 7 and eph.iodc == 357
    assert abs(eph.sqrt_a - 2702013952 * 2.0 ** -19) < 1e-9
    r = np.linalg.norm(eph.sat_pos(eph.toe_s))
    assert 2.0e7 < r < 3.2e7
    back = sm.uncompressed_from_ephemeris(eph)
    for key, v in _EPH_FIX.items():
        if key in ("ephemCodeOnL2", "ephemURA", "ephemL2Pflag",
                   "ephemSF1Rsvd", "ephemFitFlag", "ephemAODA"):
            continue
        assert back[key] == v, key


def test_suplposinit_roundtrip_with_rrlp_payload():
    rrlp = sm.encode_rrlp({"referenceNumber": 1,
                           "component": {"assistanceDataAck": None}})
    msg = {
        "version": {"maj": 1, "min": 0, "servind": 0},
        "sessionID": {"setSessionID": {
            "sessionId": 7, "setId": {"imsi": sm.imsi_bcd("001010123")}}},
        "message": {"msSUPLPOSINIT": {
            "sETCapabilities": _suplstart_value()[
                "message"]["msSUPLSTART"]["sETCapabilities"],
            "requestedAssistData": {
                "almanacRequested": False, "utcModelRequested": True,
                "ionosphericModelRequested": True,
                "dgpsCorrectionsRequested": False,
                "referenceLocationRequested": True,
                "referenceTimeRequested": True,
                "acquisitionAssistanceRequested": False,
                "realTimeIntegrityRequested": False,
                "navigationModelRequested": True},
            "locationId": _suplstart_value()[
                "message"]["msSUPLSTART"]["locationId"],
            "sUPLPOS": {"posPayLoad": {"rrlpPayload": rrlp}},
        }},
    }
    wire = sm.encode_ulp(msg)
    back = sm.decode_ulp(wire)
    pi = back["message"]["msSUPLPOSINIT"]
    assert pi["requestedAssistData"]["navigationModelRequested"] is True
    payload = pi["sUPLPOS"]["posPayLoad"]["rrlpPayload"]
    assert sm.decode_rrlp(payload)["component"] == {
        "assistanceDataAck": None}


def test_unsupported_alternative_raises_cleanly():
    with pytest.raises(NotImplementedError, match="SUPLINIT"):
        sm.decode_ulp(bytes([0x00, 0x04, 1, 0, 0, 0x00, 0x00, 0x00]))


def test_per_client_session_against_mock_server():
    """Full SUPL session over TCP with real UPER framing: the mock
    server replies SUPLRESPONSE/SUPLEND with this codec but delivers the
    RRLP assistance payload as the REFERENCE encoder's bytes
    (FIX_RRLP_ASSIST), so the client-side decode path chews actual
    asn1c output end-to-end (gnss_sdr_supl_client session flow)."""
    import socket
    import struct
    import threading

    from gnss_sdr_tpu.receiver.supl import SuplPerClient

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    errors = []

    def read_pdu(conn):
        head = conn.recv(2, socket.MSG_WAITALL)
        n = struct.unpack(">H", head)[0]
        body = conn.recv(n - 2, socket.MSG_WAITALL)
        return sm.decode_ulp(head + body)

    def server():
        try:
            conn, _ = srv.accept()
            start = read_pdu(conn)
            assert "msSUPLSTART" in start["message"]
            session = dict(start["sessionID"])
            session["slpSessionID"] = {
                "sessionID": bytes.fromhex("deadbeef"),
                "slpId": {"iPAddress": {
                    "ipv4Address": bytes([127, 0, 0, 1])}}}
            version = {"maj": 1, "min": 0, "servind": 0}
            conn.sendall(sm.encode_ulp({
                "version": version, "sessionID": session,
                "message": {"msSUPLRESPONSE": {"posMethod": 1}}}))
            posinit = read_pdu(conn)
            req = posinit["message"]["msSUPLPOSINIT"][
                "requestedAssistData"]
            assert req["navigationModelRequested"] is True
            conn.sendall(sm.encode_ulp({
                "version": version, "sessionID": session,
                "message": {"msSUPLPOS": {"posPayLoad": {
                    "rrlpPayload": FIX_RRLP_ASSIST}}}}))
            ack = read_pdu(conn)
            ack_rrlp = sm.decode_rrlp(bytes(
                ack["message"]["msSUPLPOS"]["posPayLoad"]["rrlpPayload"]))
            assert ack_rrlp["component"] == {"assistanceDataAck": None}
            conn.sendall(sm.encode_ulp({
                "version": version, "sessionID": session,
                "message": {"msSUPLEND": {"statusCode": 0}}}))
            conn.close()
        except Exception as exc:   # surfaced in the main thread
            errors.append(exc)

    th = threading.Thread(target=server)
    th.start()
    client = SuplPerClient("127.0.0.1", port=port, timeout_s=10.0)
    assistance = client.fetch_assistance(session_id=1)
    th.join(timeout=10.0)
    srv.close()
    assert not errors, errors
    assert 7 in assistance.ephemerides
    eph = assistance.ephemerides[7]
    assert eph.iodc == 357
    assert abs(eph.sqrt_a - 2702013952 * 2.0 ** -19) < 1e-9
    assert assistance.iono_alpha[0] == 10 * 2.0 ** -30
    assert assistance.utc_a0 == -20000 * 2.0 ** -30
    assert assistance.ref_time_week == 876
    assert abs(assistance.ref_time_tow_s - 1234567 * 0.08) < 1e-6

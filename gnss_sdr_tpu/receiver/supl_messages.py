"""OMA SUPL (ULP) and 3GPP RRLP message schemas + wire helpers.

The real SUPL interop layer: declarative UPER schemas transcribed from
the reference's ASN.1 modules
(/root/reference/src/core/libs/supl/asn/supl-ulp.asn, supl-common.asn,
supl-start.asn, supl-response.asn, supl-posinit.asn, supl-pos.asn,
supl-end.asn, rrlp-messages.asn, rrlp-components.asn — the same
definitions its 580-file asn1c tree was generated from), walked by the
generic codec in :mod:`gnss_sdr_tpu.receiver.asn1_per`. Validated
against byte fixtures produced by compiling and running the reference's
own asn1c encoder (tests/test_supl_per.py documents the generator).

Alternatives this client never selects (SUPLINIT push, WCDMA frequency
info, velocity, UTCTime positions) are UNSUPPORTED placeholders that
keep the PER index/bitmap layout and raise only if actually chosen.
"""

from __future__ import annotations

from gnss_sdr_tpu.receiver.asn1_per import (BITSTR, BOOL, CHOICE, ENUM, INT,
                                            NULLTYPE, OCTETS, SEQ, SEQ_OF,
                                            UNSUPPORTED, decode, encode)

# --------------------------------------------------------------------------
# ULP (supl-common.asn / supl-*.asn)
# --------------------------------------------------------------------------

VERSION = SEQ(("maj", INT(0, 255)), ("min", INT(0, 255)),
              ("servind", INT(0, 255)), ext=False)

IPADDRESS = CHOICE(("ipv4Address", OCTETS(4)),
                   ("ipv6Address", OCTETS(16)), ext=False)

SETID = CHOICE(
    ("msisdn", OCTETS(8)), ("mdn", OCTETS(8)), ("min", BITSTR(34)),
    ("imsi", OCTETS(8)), ("nai", UNSUPPORTED("IA5String")),
    ("iPAddress", IPADDRESS), ext=True)

SETSESSIONID = SEQ(("sessionId", INT(0, 65535)), ("setId", SETID),
                   ext=False)

SLPADDRESS = CHOICE(("iPAddress", IPADDRESS),
                    ("fQDN", UNSUPPORTED("FQDN")), ext=True)

SLPSESSIONID = SEQ(("sessionID", OCTETS(4)), ("slpId", SLPADDRESS),
                   ext=False)

SESSIONID = SEQ(("setSessionID", SETSESSIONID, "opt"),
                ("slpSessionID", SLPSESSIONID, "opt"), ext=False)

POS_TECHNOLOGY = SEQ(
    ("agpsSETassisted", BOOL()), ("agpsSETBased", BOOL()),
    ("autonomousGPS", BOOL()), ("aFLT", BOOL()), ("eCID", BOOL()),
    ("eOTD", BOOL()), ("oTDOA", BOOL()), ext=True)

PREF_METHOD = ENUM(3, extensible=False)
PREF_METHOD_NAMES = ("agpsSETassistedPreferred", "agpsSETBasedPreferred",
                     "noPreference")

POS_PROTOCOL = SEQ(("tia801", BOOL()), ("rrlp", BOOL()), ("rrc", BOOL()),
                   ext=True)

SET_CAPABILITIES = SEQ(("posTechnology", POS_TECHNOLOGY),
                       ("prefMethod", PREF_METHOD),
                       ("posProtocol", POS_PROTOCOL), ext=True)

NMR_ELEMENT = SEQ(("aRFCN", INT(0, 1023)), ("bSIC", INT(0, 63)),
                  ("rxLev", INT(0, 63)), ext=True)

GSM_CELL = SEQ(
    ("refMCC", INT(0, 999)), ("refMNC", INT(0, 999)),
    ("refLAC", INT(0, 65535)), ("refCI", INT(0, 65535)),
    ("nMR", SEQ_OF(NMR_ELEMENT, 1, 15), "opt"),
    ("tA", INT(0, 255), "opt"), ext=True)

WCDMA_CELL = SEQ(
    ("refMCC", INT(0, 999)), ("refMNC", INT(0, 999)),
    ("refUC", INT(0, 268435455)),
    ("frequencyInfo", UNSUPPORTED("FrequencyInfo"), "opt"),
    ("primaryScramblingCode", INT(0, 511), "opt"),
    ("measuredResultsList", UNSUPPORTED("MeasuredResultsList"), "opt"),
    ext=True)

CDMA_CELL = SEQ(
    ("refNID", INT(0, 65535)), ("refSID", INT(0, 32767)),
    ("refBASEID", INT(0, 65535)), ("refBASELAT", INT(0, 4194303)),
    ("reBASELONG", INT(0, 8388607)), ("refREFPN", INT(0, 511)),
    ("refWeekNumber", INT(0, 65535)), ("refSeconds", INT(0, 4194303)),
    ext=True)

CELL_INFO = CHOICE(("gsmCell", GSM_CELL), ("wcdmaCell", WCDMA_CELL),
                   ("cdmaCell", CDMA_CELL), ext=True)

STATUS = ENUM(3, extensible=True)          # stale/current/unknown

LOCATION_ID = SEQ(("cellInfo", CELL_INFO), ("status", STATUS), ext=True)

QOP = SEQ(("horacc", INT(0, 127)), ("veracc", INT(0, 127), "opt"),
          ("maxLocAge", INT(0, 65535), "opt"), ("delay", INT(0, 7), "opt"),
          ext=True)

SUPLSTART = SEQ(("sETCapabilities", SET_CAPABILITIES),
                ("locationId", LOCATION_ID), ("qoP", QOP, "opt"),
                ext=True)

POS_METHOD = ENUM(10, extensible=True)
POS_METHOD_NAMES = (
    "agpsSETassisted", "agpsSETbased", "agpsSETassistedpref",
    "agpsSETbasedpref", "autonomousGPS", "aFLT", "eCID", "eOTD",
    "oTDOA", "noPosition")

SET_AUTH_KEY = CHOICE(("shortKey", BITSTR(128)), ("longKey", BITSTR(256)),
                      ext=True)

SUPLRESPONSE = SEQ(
    ("posMethod", POS_METHOD),
    ("sLPAddress", SLPADDRESS, "opt"),
    ("sETAuthKey", SET_AUTH_KEY, "opt"),
    ("keyIdentity4", BITSTR(128), "opt"), ext=True)

POS_PAYLOAD = CHOICE(
    ("tia801payload", OCTETS(lo=1, hi=8192)),
    ("rrcPayload", OCTETS(lo=1, hi=8192)),
    ("rrlpPayload", OCTETS(lo=1, hi=8192)), ext=True)

SUPLPOS = SEQ(("posPayLoad", POS_PAYLOAD),
              ("velocity", UNSUPPORTED("Velocity"), "opt"), ext=True)

X_NAVIGATION_MODEL = SEQ(
    ("gpsWeek", INT(0, 1023)), ("gpsToe", INT(0, 167)),
    ("nSAT", INT(0, 31)), ("toeLimit", INT(0, 10)),
    ("satInfo", SEQ_OF(SEQ(("satId", INT(0, 63)),
                           ("iODE", INT(0, 255)), ext=True), 1, 31),
     "opt"), ext=True)

REQUESTED_ASSIST_DATA = SEQ(
    ("almanacRequested", BOOL()), ("utcModelRequested", BOOL()),
    ("ionosphericModelRequested", BOOL()),
    ("dgpsCorrectionsRequested", BOOL()),
    ("referenceLocationRequested", BOOL()),
    ("referenceTimeRequested", BOOL()),
    ("acquisitionAssistanceRequested", BOOL()),
    ("realTimeIntegrityRequested", BOOL()),
    ("navigationModelRequested", BOOL()),
    ("navigationModelData", X_NAVIGATION_MODEL, "opt"), ext=True)

SUPLPOSINIT = SEQ(
    ("sETCapabilities", SET_CAPABILITIES),
    ("requestedAssistData", REQUESTED_ASSIST_DATA, "opt"),
    ("locationId", LOCATION_ID),
    ("position", UNSUPPORTED("Position"), "opt"),
    ("sUPLPOS", SUPLPOS, "opt"),
    ("ver", BITSTR(64), "opt"), ext=True)

STATUS_CODE = ENUM(20, extensible=True)
STATUS_CODE_NAMES = (
    "unspecified", "systemFailure", "unexpectedMessage", "protocolError",
    "dataMissing", "unexpectedDataValue", "posMethodFailure",
    "posMethodMismatch", "posProtocolMismatch", "targetSETnotReachable",
    "versionNotSupported", "resourceShortage", "invalidSessionId",
    "nonProxyModeNotSupported", "proxyModeNotSupported",
    "positioningNotPermitted", "authNetFailure", "authSuplinitFailure",
    "consentDeniedByUser", "consentGrantedByUser")

SUPLEND = SEQ(("position", UNSUPPORTED("Position"), "opt"),
              ("statusCode", STATUS_CODE, "opt"),
              ("ver", BITSTR(64), "opt"), ext=True)

ULP_MESSAGE = CHOICE(
    ("msSUPLINIT", UNSUPPORTED("SUPLINIT")),
    ("msSUPLSTART", SUPLSTART),
    ("msSUPLRESPONSE", SUPLRESPONSE),
    ("msSUPLPOSINIT", SUPLPOSINIT),
    ("msSUPLPOS", SUPLPOS),
    ("msSUPLEND", SUPLEND),
    ("msDUMMY2", UNSUPPORTED("DUMMY")),
    ("msDUMMY3", UNSUPPORTED("DUMMY")), ext=True)

ULP_PDU = SEQ(("length", INT(0, 65535)), ("version", VERSION),
              ("sessionID", SESSIONID), ("message", ULP_MESSAGE),
              ext=False)


def encode_ulp(message: dict) -> bytes:
    """Encode a ULP-PDU, fixing up the mandatory ``length`` field with
    the reference's two-pass scheme (supl.c supl_ulp_encode:75-100)."""
    message = dict(message)
    message["length"] = 0
    first = encode(ULP_PDU, message)
    message["length"] = len(first)
    out = encode(ULP_PDU, message)
    assert len(out) == message["length"]
    return out


def decode_ulp(data: bytes) -> dict:
    return decode(ULP_PDU, data)


def imsi_bcd(digits: str) -> bytes:
    """IMSI digits -> 8-octet BCD, unused nibbles 0xF
    (supl-common.asn:32-37)."""
    nibbles = [int(d) for d in digits] + [0xF] * (16 - len(digits))
    return bytes(nibbles[2 * i] | (nibbles[2 * i + 1] << 4)
                 for i in range(8))


# --------------------------------------------------------------------------
# RRLP (rrlp-messages.asn / rrlp-components.asn)
# --------------------------------------------------------------------------

GPS_TIME = SEQ(("gpsTOW23b", INT(0, 7559999)), ("gpsWeek", INT(0, 1023)),
               ext=False)

GSM_TIME = SEQ(("bcchCarrier", INT(0, 1023)), ("bsic", INT(0, 63)),
               ("frameNumber", INT(0, 2097151)), ("timeSlot", INT(0, 7)),
               ("bitNumber", INT(0, 156)), ext=False)

TOW_ASSIST_ELEMENT = SEQ(
    ("satelliteID", INT(0, 63)), ("tlmWord", INT(0, 16383)),
    ("antiSpoof", INT(0, 1)), ("alert", INT(0, 1)),
    ("tlmRsvdBits", INT(0, 3)), ext=False)

REFERENCE_TIME = SEQ(
    ("gpsTime", GPS_TIME), ("gsmTime", GSM_TIME, "opt"),
    ("gpsTowAssist", SEQ_OF(TOW_ASSIST_ELEMENT, 1, 12), "opt"), ext=False)

REF_LOCATION = SEQ(("threeDLocation", OCTETS(lo=1, hi=20)), ext=False)

SAT_ELEMENT = SEQ(
    ("satelliteID", INT(0, 63)), ("iode", INT(0, 239)),
    ("udre", INT(0, 3)), ("pseudoRangeCor", INT(-2047, 2047)),
    ("rangeRateCor", INT(-127, 127)),
    ("deltaPseudoRangeCor2", INT(-127, 127)),
    ("deltaRangeRateCor2", INT(-7, 7)),
    ("deltaPseudoRangeCor3", INT(-127, 127)),
    ("deltaRangeRateCor3", INT(-7, 7)), ext=False)

DGPS_CORRECTIONS = SEQ(
    ("gpsTOW", INT(0, 604799)), ("status", INT(0, 7)),
    ("satList", SEQ_OF(SAT_ELEMENT, 1, 16)), ext=False)

EPHEM_SF1_RSVD = SEQ(
    ("reserved1", INT(0, 8388607)), ("reserved2", INT(0, 16777215)),
    ("reserved3", INT(0, 16777215)), ("reserved4", INT(0, 65535)),
    ext=False)

UNCOMPRESSED_EPHEMERIS = SEQ(
    ("ephemCodeOnL2", INT(0, 3)), ("ephemURA", INT(0, 15)),
    ("ephemSVhealth", INT(0, 63)), ("ephemIODC", INT(0, 1023)),
    ("ephemL2Pflag", INT(0, 1)), ("ephemSF1Rsvd", EPHEM_SF1_RSVD),
    ("ephemTgd", INT(-128, 127)), ("ephemToc", INT(0, 37799)),
    ("ephemAF2", INT(-128, 127)), ("ephemAF1", INT(-32768, 32767)),
    ("ephemAF0", INT(-2097152, 2097151)),
    ("ephemCrs", INT(-32768, 32767)),
    ("ephemDeltaN", INT(-32768, 32767)),
    ("ephemM0", INT(-2147483648, 2147483647)),
    ("ephemCuc", INT(-32768, 32767)), ("ephemE", INT(0, 4294967295)),
    ("ephemCus", INT(-32768, 32767)),
    ("ephemAPowerHalf", INT(0, 4294967295)),
    ("ephemToe", INT(0, 37799)), ("ephemFitFlag", INT(0, 1)),
    ("ephemAODA", INT(0, 31)), ("ephemCic", INT(-32768, 32767)),
    ("ephemOmegaA0", INT(-2147483648, 2147483647)),
    ("ephemCis", INT(-32768, 32767)),
    ("ephemI0", INT(-2147483648, 2147483647)),
    ("ephemCrc", INT(-32768, 32767)),
    ("ephemW", INT(-2147483648, 2147483647)),
    ("ephemOmegaADot", INT(-8388608, 8388607)),
    ("ephemIDot", INT(-8192, 8191)), ext=False)

SAT_STATUS = CHOICE(
    ("newSatelliteAndModelUC", UNCOMPRESSED_EPHEMERIS),
    ("oldSatelliteAndModel", NULLTYPE()),
    ("newNaviModelUC", UNCOMPRESSED_EPHEMERIS), ext=True)

NAV_MODEL_ELEMENT = SEQ(("satelliteID", INT(0, 63)),
                        ("satStatus", SAT_STATUS), ext=False)

NAVIGATION_MODEL = SEQ(
    ("navModelList", SEQ_OF(NAV_MODEL_ELEMENT, 1, 16)), ext=False)

IONOSPHERIC_MODEL = SEQ(
    ("alfa0", INT(-128, 127)), ("alfa1", INT(-128, 127)),
    ("alfa2", INT(-128, 127)), ("alfa3", INT(-128, 127)),
    ("beta0", INT(-128, 127)), ("beta1", INT(-128, 127)),
    ("beta2", INT(-128, 127)), ("beta3", INT(-128, 127)), ext=False)

UTC_MODEL = SEQ(
    ("utcA1", INT(-8388608, 8388607)),
    ("utcA0", INT(-2147483648, 2147483647)),
    ("utcTot", INT(0, 255)), ("utcWNt", INT(0, 255)),
    ("utcDeltaTls", INT(-128, 127)), ("utcWNlsf", INT(0, 255)),
    ("utcDN", INT(-128, 127)), ("utcDeltaTlsf", INT(-128, 127)),
    ext=False)

ALMANAC_ELEMENT = SEQ(
    ("satelliteID", INT(0, 63)), ("almanacE", INT(0, 65535)),
    ("alamanacToa", INT(0, 255)), ("almanacKsii", INT(-32768, 32767)),
    ("almanacOmegaDot", INT(-32768, 32767)),
    ("almanacSVhealth", INT(0, 255)),
    ("almanacAPowerHalf", INT(0, 16777215)),
    ("almanacOmega0", INT(-8388608, 8388607)),
    ("almanacW", INT(-8388608, 8388607)),
    ("almanacM0", INT(-8388608, 8388607)),
    ("almanacAF0", INT(-1024, 1023)), ("almanacAF1", INT(-1024, 1023)),
    ext=False)

ALMANAC = SEQ(("alamanacWNa", INT(0, 255)),
              ("almanacList", SEQ_OF(ALMANAC_ELEMENT, 1, 64)), ext=False)

ADDITIONAL_DOPPLER = SEQ(("doppler1", INT(0, 63)),
                         ("dopplerUncertainty", INT(0, 7)), ext=False)

ADDITIONAL_ANGLE = SEQ(("azimuth", INT(0, 31)), ("elevation", INT(0, 7)),
                       ext=False)

ACQUIS_ELEMENT = SEQ(
    ("svid", INT(0, 63)), ("doppler0", INT(-2048, 2047)),
    ("addionalDoppler", ADDITIONAL_DOPPLER, "opt"),
    ("codePhase", INT(0, 1022)), ("intCodePhase", INT(0, 19)),
    ("gpsBitNumber", INT(0, 3)), ("codePhaseSearchWindow", INT(0, 15)),
    ("addionalAngle", ADDITIONAL_ANGLE, "opt"), ext=False)

ACQUIS_ASSIST = SEQ(
    ("timeRelation", SEQ(("gpsTOW", INT(0, 7559999)),
                         ("gsmTime", GSM_TIME, "opt"), ext=False)),
    ("acquisList", SEQ_OF(ACQUIS_ELEMENT, 1, 16)), ext=False)

CONTROL_HEADER = SEQ(
    ("referenceTime", REFERENCE_TIME, "opt"),
    ("refLocation", REF_LOCATION, "opt"),
    ("dgpsCorrections", DGPS_CORRECTIONS, "opt"),
    ("navigationModel", NAVIGATION_MODEL, "opt"),
    ("ionosphericModel", IONOSPHERIC_MODEL, "opt"),
    ("utcModel", UTC_MODEL, "opt"),
    ("almanac", ALMANAC, "opt"),
    ("acquisAssist", ACQUIS_ASSIST, "opt"),
    ("realTimeIntegrity", SEQ_OF(INT(0, 63), 1, 16), "opt"), ext=False)

GPS_ASSIST_DATA = SEQ(("controlHeader", CONTROL_HEADER), ext=False)

REFERENCE_ASSIST_DATA = SEQ(
    ("bcchCarrier", INT(0, 1023)), ("bsic", INT(0, 63)),
    ("timeSlotScheme", ENUM(2, extensible=False)),
    ("btsPosition", OCTETS(lo=1, hi=20), "opt"), ext=False)

ACCURACY_OPT = SEQ(("accuracy", INT(0, 127), "opt"), ext=False)

METHOD_TYPE = CHOICE(
    ("msAssisted", ACCURACY_OPT), ("msBased", INT(0, 127)),
    ("msBasedPref", INT(0, 127)), ("msAssistedPref", INT(0, 127)),
    ext=False)

POSITION_INSTRUCT = SEQ(
    ("methodType", METHOD_TYPE),
    ("positionMethod", ENUM(3, extensible=False)),
    ("measureResponseTime", INT(0, 7)),
    ("useMultipleSets", ENUM(2, extensible=False)),
    ("environmentCharacter", ENUM(3, extensible=True), "opt"), ext=False)

MSR_POSITION_REQ = SEQ(
    ("positionInstruct", POSITION_INSTRUCT),
    ("referenceAssistData", REFERENCE_ASSIST_DATA, "opt"),
    ("msrAssistData", UNSUPPORTED("MsrAssistData"), "opt"),
    ("systemInfoAssistData", UNSUPPORTED("SystemInfoAssistData"), "opt"),
    ("gps-AssistData", GPS_ASSIST_DATA, "opt"),
    ("extensionContainer", UNSUPPORTED("ExtensionContainer"), "opt"),
    ext=True)

ASSISTANCE_DATA = SEQ(
    ("referenceAssistData", REFERENCE_ASSIST_DATA, "opt"),
    ("msrAssistData", UNSUPPORTED("MsrAssistData"), "opt"),
    ("systemInfoAssistData", UNSUPPORTED("SystemInfoAssistData"), "opt"),
    ("gps-AssistData", GPS_ASSIST_DATA, "opt"),
    ("moreAssDataToBeSent", ENUM(2, extensible=False), "opt"),
    ("extensionContainer", UNSUPPORTED("ExtensionContainer"), "opt"),
    ext=True)

RRLP_COMPONENT = CHOICE(
    ("msrPositionReq", MSR_POSITION_REQ),
    ("msrPositionRsp", UNSUPPORTED("MsrPosition-Rsp")),
    ("assistanceData", ASSISTANCE_DATA),
    ("assistanceDataAck", NULLTYPE()),
    ("protocolError", UNSUPPORTED("ProtocolError")), ext=True)

RRLP_PDU = SEQ(("referenceNumber", INT(0, 7)),
               ("component", RRLP_COMPONENT), ext=False)


def encode_rrlp(pdu: dict) -> bytes:
    return encode(RRLP_PDU, pdu)


def decode_rrlp(data: bytes) -> dict:
    return decode(RRLP_PDU, data)


# --------------------------------------------------------------------------
# RRLP navigation model -> receiver ephemeris
# --------------------------------------------------------------------------

_PI = 3.1415926535898


def ephemeris_from_uncompressed(sat_id: int, e: dict):
    """UncompressedEphemeris (ICD-scaled integers, TS 44.031) ->
    :class:`GpsEphemeris` (the supl client's nav-model consumption,
    gnss_sdr_supl_client.cc read_supl_data ephemeris block)."""
    from gnss_sdr_tpu.pvt.ephemeris import GpsEphemeris

    return GpsEphemeris(
        prn=sat_id + 1,
        sv_health=e["ephemSVhealth"], iodc=e["ephemIODC"],
        iode=e["ephemIODC"] & 0xFF,
        toc_s=e["ephemToc"] * 16.0,
        af0=e["ephemAF0"] * 2.0 ** -31, af1=e["ephemAF1"] * 2.0 ** -43,
        af2=e["ephemAF2"] * 2.0 ** -55, tgd_s=e["ephemTgd"] * 2.0 ** -31,
        toe_s=e["ephemToe"] * 16.0,
        sqrt_a=e["ephemAPowerHalf"] * 2.0 ** -19,
        ecc=e["ephemE"] * 2.0 ** -33,
        m0_rad=e["ephemM0"] * 2.0 ** -31 * _PI,
        delta_n_rad_s=e["ephemDeltaN"] * 2.0 ** -43 * _PI,
        omega0_rad=e["ephemOmegaA0"] * 2.0 ** -31 * _PI,
        i0_rad=e["ephemI0"] * 2.0 ** -31 * _PI,
        omega_rad=e["ephemW"] * 2.0 ** -31 * _PI,
        omega_dot_rad_s=e["ephemOmegaADot"] * 2.0 ** -43 * _PI,
        idot_rad_s=e["ephemIDot"] * 2.0 ** -43 * _PI,
        cuc_rad=e["ephemCuc"] * 2.0 ** -29,
        cus_rad=e["ephemCus"] * 2.0 ** -29,
        crc_m=e["ephemCrc"] * 2.0 ** -5, crs_m=e["ephemCrs"] * 2.0 ** -5,
        cic_rad=e["ephemCic"] * 2.0 ** -29,
        cis_rad=e["ephemCis"] * 2.0 ** -29)


def uncompressed_from_ephemeris(eph) -> dict:
    """Inverse scaling (test oracle + assistance-server role)."""
    def q(v, scale):
        return int(round(v / scale))

    return dict(
        ephemCodeOnL2=1, ephemURA=0, ephemSVhealth=eph.sv_health & 0x3F,
        ephemIODC=eph.iodc & 0x3FF, ephemL2Pflag=0,
        ephemSF1Rsvd=dict(reserved1=0, reserved2=0, reserved3=0,
                          reserved4=0),
        ephemTgd=q(eph.tgd_s, 2.0 ** -31), ephemToc=q(eph.toc_s, 16.0),
        ephemAF2=q(eph.af2, 2.0 ** -55), ephemAF1=q(eph.af1, 2.0 ** -43),
        ephemAF0=q(eph.af0, 2.0 ** -31),
        ephemCrs=q(eph.crs_m, 2.0 ** -5),
        ephemDeltaN=q(eph.delta_n_rad_s, 2.0 ** -43 * _PI),
        ephemM0=q(eph.m0_rad, 2.0 ** -31 * _PI),
        ephemCuc=q(eph.cuc_rad, 2.0 ** -29),
        ephemE=q(eph.ecc, 2.0 ** -33),
        ephemCus=q(eph.cus_rad, 2.0 ** -29),
        ephemAPowerHalf=q(eph.sqrt_a, 2.0 ** -19),
        ephemToe=q(eph.toe_s, 16.0), ephemFitFlag=0, ephemAODA=0,
        ephemCic=q(eph.cic_rad, 2.0 ** -29),
        ephemOmegaA0=q(eph.omega0_rad, 2.0 ** -31 * _PI),
        ephemCis=q(eph.cis_rad, 2.0 ** -29),
        ephemI0=q(eph.i0_rad, 2.0 ** -31 * _PI),
        ephemCrc=q(eph.crc_m, 2.0 ** -5),
        ephemW=q(eph.omega_rad, 2.0 ** -31 * _PI),
        ephemOmegaADot=q(eph.omega_dot_rad_s, 2.0 ** -43 * _PI),
        ephemIDot=q(eph.idot_rad_s, 2.0 ** -43 * _PI))

"""GLONASS GNAV navigation-message codec.

Counterpart of the reference's GNAV chain
(/root/reference/src/algorithms/telemetry_decoder/gnuradio_blocks/
glonass_l1_ca_telemetry_decoder_gs.cc and
src/core/system_parameters/glonass_gnav_navigation_message.cc):

- 85-bit strings protected by the (85,77) KX Hamming code with the ICD's
  C1..C7 + C_Sigma acceptance rule (CRC_test, :39-130), index tables in
  _gnav_crc_data;
- bi-binary (meander) symbol layer with the 30-chip time mark;
- strings 1-4 parsed into the state-vector ephemeris (position/velocity/
  acceleration at tb + clock gamma/tau).

Bit conventions follow the reference exactly: string bit n (ICD 1..85) is
array index n-1 with bit 85 transmitted first; fields address bits via
(first, length) pairs read MSB-first from index 85-first
(read_navigation_unsigned, :152-165); signed fields are sign-magnitude.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnss_sdr_tpu.telemetry._gnav_crc_data import (
    CRC_I_INDEX, CRC_J_INDEX, CRC_K_INDEX, CRC_L_INDEX,
    CRC_M_INDEX, CRC_N_INDEX, CRC_P_INDEX, CRC_Q_INDEX,
)

STRING_BITS = 85
TIME_MARK = np.array([1, 1, 1, 1, 1, 0, 0, 0, 1, 1, 0, 1, 1, 1, 0, 1, 0, 1,
                      0, 0, 0, 0, 1, 0, 0, 1, 0, 1, 1, 0], dtype=np.int64)

_CHECK_SETS = (CRC_I_INDEX, CRC_J_INDEX, CRC_K_INDEX, CRC_L_INDEX,
               CRC_M_INDEX, CRC_N_INDEX, CRC_P_INDEX)


def check_string(bits85: np.ndarray) -> bool:
    """KX Hamming validity (CRC_test acceptance rules a-i / a-ii)."""
    b = np.asarray(bits85, dtype=np.int64)
    cs = []
    for i, idx in enumerate(_CHECK_SETS):
        s = sum(int(b[j - 1]) for j in idx) % 2
        cs.append(int(b[i]) ^ s)
    sq = sum(int(b[j - 1]) for j in CRC_Q_INDEX) % 2
    c_sigma = (int(np.sum(b[:8])) % 2) ^ sq
    if sum(cs) + c_sigma == 0:
        return True
    if c_sigma == 1 and sum(cs) == 1:
        return True
    return False


def encode_checks(data_bits: np.ndarray) -> np.ndarray:
    """85-bit string from 77 data bits (string bits 9..85): solve the 8
    check bits so every checksum is zero."""
    b = np.zeros(STRING_BITS, dtype=np.int64)
    b[8:] = np.asarray(data_bits, dtype=np.int64)
    for i, idx in enumerate(_CHECK_SETS):
        b[i] = sum(int(b[j - 1]) for j in idx) % 2
    sq = sum(int(b[j - 1]) for j in CRC_Q_INDEX) % 2
    b[7] = (int(np.sum(b[:7])) % 2) ^ sq
    assert check_string(b)
    return b


# -- field access (reference read_navigation_* conventions) ----------------


def _read_u(b: np.ndarray, first: int, length: int) -> int:
    v = 0
    for j in range(length):
        v = (v << 1) | int(b[STRING_BITS - first - j])
    return v


def _read_s(b: np.ndarray, first: int, length: int) -> int:
    """Sign-magnitude signed field (GLONASS ICD)."""
    raw = _read_u(b, first, length)
    mag = raw & ((1 << (length - 1)) - 1)
    return -mag if raw >> (length - 1) else mag


def _write_u(b: np.ndarray, first: int, length: int, value: int) -> None:
    assert 0 <= value < (1 << length)
    for j in range(length):
        b[STRING_BITS - first - j] = (value >> (length - 1 - j)) & 1


def _write_s(b: np.ndarray, first: int, length: int, value: int) -> None:
    sign = 1 if value < 0 else 0
    raw = (sign << (length - 1)) | abs(value)
    _write_u(b, first, length, raw)


TWO_N11 = 2.0**-11
TWO_N20 = 2.0**-20
TWO_N30 = 2.0**-30


def parse_string(bits85: np.ndarray) -> dict | None:
    """Parse strings 1-4 (state-vector ephemeris + clock)."""
    b = np.asarray(bits85, dtype=np.int64)
    if not check_string(b):
        return None
    sid = _read_u(b, 2, 4)
    out: dict = {"string_id": sid}
    if sid == 1:
        out["t_k_s"] = (_read_u(b, 10, 5) * 3600 + _read_u(b, 15, 6) * 60
                        + _read_u(b, 21, 1) * 30)
        out["vx_km_s"] = _read_s(b, 22, 24) * TWO_N20
        out["ax_km_s2"] = _read_s(b, 46, 5) * TWO_N30
        out["x_km"] = _read_s(b, 51, 27) * TWO_N11
    elif sid == 2:
        out["tb_min"] = _read_u(b, 12, 7) * 15
        out["vy_km_s"] = _read_s(b, 22, 24) * TWO_N20
        out["ay_km_s2"] = _read_s(b, 46, 5) * TWO_N30
        out["y_km"] = _read_s(b, 51, 27) * TWO_N11
    elif sid == 3:
        out["gamma_n"] = _read_s(b, 7, 11) * 2.0**-40
        out["vz_km_s"] = _read_s(b, 22, 24) * TWO_N20
        out["az_km_s2"] = _read_s(b, 46, 5) * TWO_N30
        out["z_km"] = _read_s(b, 51, 27) * TWO_N11
    elif sid == 4:
        out["tau_n_s"] = _read_s(b, 6, 22) * 2.0**-30
        out["n_t"] = _read_u(b, 60, 11)
    elif sid == 5:
        # UTC/system-time string (GLONASS_L1_L2_CA.h:286-290;
        # glonass_gnav_navigation_message.cc case 5)
        out["n_a_day"] = _read_u(b, 6, 11)
        out["tau_c_s"] = _read_s(b, 17, 32) * 2.0**-31
        out["n_4"] = _read_u(b, 50, 5)
        out["tau_gps_s"] = _read_s(b, 55, 22) * 2.0**-30
        out["l_n"] = _read_u(b, 77, 1)
    elif sid in (6, 8, 10, 12, 14):
        # almanac even string: orbit part 1 of one slot
        # (GLONASS_L1_L2_CA.h:293-299; message.cc case 6/8/10/12/14)
        out["c_n"] = _read_u(b, 6, 1)
        out["m_n_a"] = _read_u(b, 7, 2)
        out["slot"] = _read_u(b, 9, 5)
        out["tau_n_a_s"] = _read_u(b, 14, 10) * 2.0**-18
        out["lambda_n_a_rad"] = _read_s(b, 24, 21) * 2.0**-20 * np.pi
        out["delta_i_n_a_rad"] = _read_s(b, 45, 18) * 2.0**-20 * np.pi
        out["epsilon_n_a"] = _read_u(b, 63, 15) * 2.0**-20
    elif sid in (7, 9, 11, 13, 15):
        # almanac odd string: orbit part 2 (pairs with the preceding even
        # string's slot; GLONASS_L1_L2_CA.h:302-306)
        out["omega_n_a_rad"] = _read_s(b, 6, 16) * 2.0**-15 * np.pi
        out["t_lambda_n_a_s"] = _read_u(b, 22, 21) * 2.0**-5
        out["delta_t_n_a_s"] = _read_s(b, 43, 22) * 2.0**-9
        out["delta_t_dot_n_a"] = _read_s(b, 65, 7) * 2.0**-14
        out["h_n_a"] = _read_u(b, 72, 5)
        out["l_n"] = _read_u(b, 77, 1)
    return out


def build_string(fields: dict) -> np.ndarray:
    """Encode strings 1-4 (inverse of parse, simulation side)."""
    b = np.zeros(STRING_BITS, dtype=np.int64)
    sid = fields["string_id"]
    _write_u(b, 2, 4, sid)
    if sid == 1:
        t = fields["t_k_s"]
        _write_u(b, 10, 5, int(t // 3600))
        _write_u(b, 15, 6, int((t % 3600) // 60))
        _write_u(b, 21, 1, int((t % 60) // 30))
        _write_s(b, 22, 24, int(round(fields["vx_km_s"] / TWO_N20)))
        _write_s(b, 46, 5, int(round(fields["ax_km_s2"] / TWO_N30)))
        _write_s(b, 51, 27, int(round(fields["x_km"] / TWO_N11)))
    elif sid == 2:
        _write_u(b, 12, 7, int(fields["tb_min"] // 15))
        _write_s(b, 22, 24, int(round(fields["vy_km_s"] / TWO_N20)))
        _write_s(b, 46, 5, int(round(fields["ay_km_s2"] / TWO_N30)))
        _write_s(b, 51, 27, int(round(fields["y_km"] / TWO_N11)))
    elif sid == 3:
        _write_s(b, 7, 11, int(round(fields.get("gamma_n", 0.0) / 2.0**-40)))
        _write_s(b, 22, 24, int(round(fields["vz_km_s"] / TWO_N20)))
        _write_s(b, 46, 5, int(round(fields["az_km_s2"] / TWO_N30)))
        _write_s(b, 51, 27, int(round(fields["z_km"] / TWO_N11)))
    elif sid == 4:
        _write_s(b, 6, 22, int(round(fields.get("tau_n_s", 0.0) / 2.0**-30)))
        _write_u(b, 60, 11, fields.get("n_t", 0))
    elif sid == 5:
        _write_u(b, 6, 11, fields.get("n_a_day", 0))
        _write_s(b, 17, 32, int(round(fields.get("tau_c_s", 0.0) / 2.0**-31)))
        _write_u(b, 50, 5, fields.get("n_4", 1))
        _write_s(b, 55, 22, int(round(fields.get("tau_gps_s", 0.0)
                                      / 2.0**-30)))
        _write_u(b, 77, 1, fields.get("l_n", 0))
    elif sid in (6, 8, 10, 12, 14):
        _write_u(b, 6, 1, fields.get("c_n", 1))
        _write_u(b, 7, 2, fields.get("m_n_a", 1))
        _write_u(b, 9, 5, fields.get("slot", 1))
        _write_u(b, 14, 10, int(round(fields.get("tau_n_a_s", 0.0)
                                      / 2.0**-18)))
        _write_s(b, 24, 21, int(round(fields.get("lambda_n_a_rad", 0.0)
                                      / (2.0**-20 * np.pi))))
        _write_s(b, 45, 18, int(round(fields.get("delta_i_n_a_rad", 0.0)
                                      / (2.0**-20 * np.pi))))
        _write_u(b, 63, 15, int(round(fields.get("epsilon_n_a", 0.0)
                                      / 2.0**-20)))
    elif sid in (7, 9, 11, 13, 15):
        _write_s(b, 6, 16, int(round(fields.get("omega_n_a_rad", 0.0)
                                     / (2.0**-15 * np.pi))))
        _write_u(b, 22, 21, int(round(fields.get("t_lambda_n_a_s", 0.0)
                                      / 2.0**-5)))
        _write_s(b, 43, 22, int(round(fields.get("delta_t_n_a_s", 0.0)
                                      / 2.0**-9)))
        _write_s(b, 65, 7, int(round(fields.get("delta_t_dot_n_a", 0.0)
                                     / 2.0**-14)))
        _write_u(b, 72, 5, fields.get("h_n_a", 0))
        _write_u(b, 77, 1, fields.get("l_n", 0))
    return encode_checks(b[8:])


# -- symbol layer ----------------------------------------------------------


def string_to_symbols(bits85: np.ndarray) -> np.ndarray:
    """One 2 s string as +-1 10 ms chips: 170 bi-binary data chips
    (bit b -> [b, not b], transmitted bit 85 first) + 30 time-mark chips."""
    b = np.asarray(bits85, dtype=np.int64)[::-1]  # bit 85 first
    chips = np.empty(170, dtype=np.int64)
    chips[0::2] = b
    chips[1::2] = 1 - b
    full = np.concatenate([chips, TIME_MARK])
    return np.where(full == 1, -1.0, 1.0)


@dataclasses.dataclass
class GnavStringUpdate:
    string_id: int
    fields: dict
    sample_stamp: int


class GlonassGnavDecoder:
    """Streaming GNAV decoder over 10 ms soft chips.

    Time-mark correlation locks the string boundary; each following 2 s
    window decodes one string (bi-binary majority + KX check). Strings
    1-4 accumulate the state-vector ephemeris; t_b anchors GLONASS time
    (string 1's t_k gives intra-frame time).
    """

    def __init__(self, crc_stats=None):
        self.crc_stats = crc_stats   # optional TlmCrcStats (KX outcomes)
        self.history: list[float] = []
        self.stamps: list[int] = []
        self.synced = False
        self.inverted = False
        self.next_string_start = 0
        self.strings: list[GnavStringUpdate] = []
        self.ephemeris_fields: dict = {}
        self.utc_model: dict = {}          # string 5 (tau_c, N4, tau_gps)
        self.almanacs: dict[int, dict] = {}  # slot -> merged even+odd fields
        self._alm_pending: dict | None = None

    def feed(self, chip: float, sample_stamp: int) -> GnavStringUpdate | None:
        self.history.append(float(chip))
        self.stamps.append(int(sample_stamp))
        if not self.synced:
            self._search_time_mark()
            return None
        return self._try_decode_string()

    def _search_time_mark(self) -> None:
        n = len(TIME_MARK)
        if len(self.history) < n:
            return
        ref = np.where(TIME_MARK == 1, -1.0, 1.0)
        corr = float(np.sum(np.sign(self.history[-n:]) * ref))
        if abs(corr) == n:
            self.synced = True
            self.inverted = corr < 0
            self.next_string_start = len(self.history)
            del self.history[: self.next_string_start - 0]
            del self.stamps[: self.next_string_start - 0]
            self.next_string_start = 0

    def _try_decode_string(self) -> GnavStringUpdate | None:
        if len(self.history) - self.next_string_start < 200:
            return None
        lo = self.next_string_start
        sym = np.asarray(self.history[lo: lo + 200])
        if self.inverted:
            sym = -sym
        stamp = self.stamps[lo + 199]
        self.next_string_start += 200
        # verify trailing time mark
        ref = np.where(TIME_MARK == 1, -1.0, 1.0)
        if float(np.sum(np.sign(sym[170:]) * ref)) != len(TIME_MARK):
            self.synced = False
            keep = len(TIME_MARK)
            self.history = self.history[-keep:]
            self.stamps = self.stamps[-keep:]
            self.next_string_start = 0
            return None
        # bi-binary: bit = sign(chip0 - chip1); chips are -1 for bit 1
        pairs = sym[:170].reshape(85, 2)
        bits_tx_order = (pairs[:, 0] - pairs[:, 1] < 0).astype(np.int64)
        bits85 = bits_tx_order[::-1]  # bit 85 transmitted first
        fields = parse_string(bits85)
        if self.crc_stats is not None:
            self.crc_stats.update(fields is not None)
        # trim
        if self.next_string_start > 400:
            drop = self.next_string_start - 200
            del self.history[:drop]
            del self.stamps[:drop]
            self.next_string_start -= drop
        if fields is None:
            return None
        update = GnavStringUpdate(fields["string_id"], fields, stamp)
        self.strings.append(update)
        sid = fields["string_id"]
        if sid in (1, 2, 3, 4):
            self.ephemeris_fields.update(fields)
        elif sid == 5:
            self.utc_model = fields
        elif sid in (6, 8, 10, 12, 14):
            self._alm_pending = fields
        elif sid in (7, 9, 11, 13, 15):
            # odd almanac string completes the even one's slot
            # (glonass_gnav_navigation_message.cc case 7/9/11/13/15)
            if self._alm_pending is not None:
                slot = self._alm_pending["slot"]
                self.almanacs[slot] = {**self._alm_pending, **fields}
                self._alm_pending = None
        return update

    def has_full_ephemeris(self) -> bool:
        f = self.ephemeris_fields
        return all(k in f for k in
                   ("x_km", "y_km", "z_km", "vx_km_s", "vy_km_s", "vz_km_s",
                    "tb_min"))

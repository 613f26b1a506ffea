"""Galileo HAS (High Accuracy Service) message assembly and decoding.

Counterpart of the reference's ``galileo_e6_has_msg_receiver``
(reference: src/core/libs/galileo_e6_has_msg_receiver.cc:215-265
``process_HAS_page``, :300-441 ``decode_message_type1``, :441-470
``read_MT1_header``, :470-887 ``read_MT1_body``) and of the
``Galileo_HAS_data`` container
(src/core/system_parameters/galileo_has_data.{h,cc}).

The HAS MT1 message is vertically Reed-Solomon encoded with the
RS(255,32) mother code: a message of MS (<=32) pages of 53 octets is
the top of a 255x53 octet matrix C whose columns are RS codewords; any
32 distinct received pages (PIDs) recover the message by treating the
missing rows as erasures (HAS SIS ICD 1.0 section 6).

Scale factors per HAS SIS ICD 1.0 Tables 25/31/37/40 (mirrored from
Galileo_CNAV.h:84-89).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .galileo_cnav import HasPage, MESSAGE_BITS_PER_PAGE
from .reed_solomon import ReedSolomon

OCTETS_IN_SUBPAGE = MESSAGE_BITS_PER_PAGE // 8  # 53
INFO_VECTOR_LEN = 32    # info symbols of the mother code
ENCODED_BLOCK = 255
N_MESSAGE_IDS = 32
N_MASK_IDS = 32
N_SATELLITE_IDS = 40
N_SIGNAL_MASKS = 16
MAX_TOH = 3599

GPS_SYSTEM = 0
GALILEO_SYSTEM = 2

DELTA_RADIAL_SCALE = 0.0025
DELTA_IN_TRACK_SCALE = 0.008
DELTA_CROSS_TRACK_SCALE = 0.008
DELTA_CLOCK_SCALE = 0.0025
CODE_BIAS_SCALE = 0.02
PHASE_BIAS_SCALE = 0.01


@dataclass
class HasHeader:
    """MT1 message header (HAS SIS ICD 1.0 Table 13)."""

    toh: int = 0
    mask_flag: bool = False
    orbit_correction_flag: bool = False
    clock_fullset_flag: bool = False
    clock_subset_flag: bool = False
    code_bias_flag: bool = False
    phase_bias_flag: bool = False
    reserved: int = 0
    mask_id: int = 0
    iod_set_id: int = 0


@dataclass
class HasData:
    """Decoded MT1 content (reference: galileo_has_data.h)."""

    header: HasHeader = field(default_factory=HasHeader)
    tow: int = 2 ** 32 - 1
    # mask section
    Nsys: int = 0
    gnss_id_mask: list[int] = field(default_factory=list)
    satellite_mask: list[int] = field(default_factory=list)
    signal_mask: list[int] = field(default_factory=list)
    cell_mask_availability_flag: list[bool] = field(default_factory=list)
    cell_mask: list[np.ndarray] = field(default_factory=list)  # per sys: (nsat, nsig) bool
    nav_message: list[int] = field(default_factory=list)
    # orbit corrections (raw ints; scaled accessors below)
    validity_orbit: int = 0
    gnss_iod: list[int] = field(default_factory=list)
    delta_radial: list[int] = field(default_factory=list)
    delta_in_track: list[int] = field(default_factory=list)
    delta_cross_track: list[int] = field(default_factory=list)
    # clock full-set
    validity_clock_fullset: int = 0
    delta_clock_multiplier: list[int] = field(default_factory=list)
    delta_clock_correction: list[int] = field(default_factory=list)
    # clock subset
    validity_clock_subset: int = 0
    Nsys_sub: int = 0
    gnss_id_clock_subset: list[int] = field(default_factory=list)
    delta_clock_multiplier_clock_subset: list[int] = field(default_factory=list)
    satellite_submask: list[int] = field(default_factory=list)
    delta_clock_correction_clock_subset: list[list[int]] = field(default_factory=list)
    # biases
    validity_code_bias: int = 0
    code_bias: np.ndarray | None = None   # (Nsat, max_signals) int
    validity_phase_bias: int = 0
    phase_bias: np.ndarray | None = None
    phase_discontinuity_indicator: np.ndarray | None = None

    def sats_in_system(self, sys_index: int) -> int:
        return bin(self.satellite_mask[sys_index]).count("1")

    def gnss_id_for_sat(self, sat_index: int) -> int:
        """GNSS ID of the i-th satellite across the concatenated masks
        (reference: Galileo_HAS_data::get_gnss_id)."""
        acc = 0
        for i in range(self.Nsys):
            acc += self.sats_in_system(i)
            if sat_index < acc:
                return self.gnss_id_mask[i]
        return 255

    def prns(self) -> list[tuple[int, int]]:
        """(gnss_id, prn) pairs in mask order; PRN = bit position + 1."""
        out = []
        for i in range(self.Nsys):
            mask = self.satellite_mask[i]
            for bit in range(N_SATELLITE_IDS):
                if (mask >> (N_SATELLITE_IDS - 1 - bit)) & 1:
                    out.append((self.gnss_id_mask[i], bit + 1))
        return out

    def delta_radial_m(self) -> np.ndarray:
        return np.asarray(self.delta_radial, dtype=np.float64) * DELTA_RADIAL_SCALE

    def delta_in_track_m(self) -> np.ndarray:
        return np.asarray(self.delta_in_track, dtype=np.float64) * DELTA_IN_TRACK_SCALE

    def delta_cross_track_m(self) -> np.ndarray:
        return np.asarray(self.delta_cross_track, dtype=np.float64) * DELTA_CROSS_TRACK_SCALE

    def delta_clock_m(self) -> np.ndarray:
        mult = np.ones(len(self.delta_clock_correction))
        sat = 0
        for i in range(self.Nsys):
            n = self.sats_in_system(i)
            if i < len(self.delta_clock_multiplier):
                mult[sat:sat + n] = self.delta_clock_multiplier[i]
            sat += n
        return (np.asarray(self.delta_clock_correction, dtype=np.float64)
                * DELTA_CLOCK_SCALE * mult)

    def code_bias_m(self) -> np.ndarray:
        if self.code_bias is None:
            return np.zeros((0, 0))
        return self.code_bias.astype(np.float64) * CODE_BIAS_SCALE

    def phase_bias_cycle(self) -> np.ndarray:
        if self.phase_bias is None:
            return np.zeros((0, 0))
        return self.phase_bias.astype(np.float64) * PHASE_BIAS_SCALE


class _BitReader:
    def __init__(self, bits: str):
        self.bits = bits
        self.pos = 0

    def u(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError("HAS MT1 body exhausted")
        v = int(self.bits[self.pos:self.pos + n], 2) if n else 0
        self.pos += n
        return v

    def s(self, n: int) -> int:
        v = self.u(n)
        if v >= 1 << (n - 1):
            v -= 1 << n
        return v

    def raw(self, n: int) -> str:
        if self.pos + n > len(self.bits):
            raise ValueError("HAS MT1 body exhausted")
        out = self.bits[self.pos:self.pos + n]
        self.pos += n
        return out


class HasMessageReceiver:
    """Accumulates HAS pages per message ID and decodes complete MT1
    messages via RS erasure decoding (process_HAS_page /
    decode_message_type1 semantics)."""

    def __init__(self):
        self._rs = ReedSolomon("E6B")
        self._C = np.zeros((N_MESSAGE_IDS, ENCODED_BLOCK, OCTETS_IN_SUBPAGE),
                           dtype=np.uint8)
        self._received_pids: list[set[int]] = [set() for _ in range(N_MESSAGE_IDS)]
        self._timestamps: list[int] = [0] * N_MESSAGE_IDS
        self._current_toh: int | None = None
        # stored masks per mask_id for messages without a mask section
        self._stored_masks: dict[int, HasData] = {}
        self._nsat_in_mask: dict[int, int] = {}

    # -- page intake ------------------------------------------------------

    def process_page(self, page: HasPage) -> HasData | None:
        """Feed one HAS page; returns a decoded HasData when a message
        completes (and its mask is known), else None."""
        if page.dummy or page.message_type != 1 or page.message_page_id == 0:
            return None
        if page.has_status not in (0, 1):
            return None
        mid = page.message_id
        if mid >= N_MESSAGE_IDS:
            return None
        self._delete_outdated(page)
        pid = page.message_page_id
        if pid not in self._received_pids[mid]:
            self._received_pids[mid].add(pid)
            self._timestamps[mid] = page.time_stamp
            octets = np.array(
                [int(page.has_message_string[k * 8:(k + 1) * 8], 2)
                 for k in range(OCTETS_IN_SUBPAGE)], dtype=np.uint8)
            self._C[mid, pid - 1] = octets
        if len(self._received_pids[mid]) >= page.message_size:
            return self._decode_mt1(mid, page.message_size, page.tow)
        return None

    def _delete_outdated(self, page: HasPage) -> None:
        """A new TOH means a new HAS epoch: drop partial messages
        (reference :267-298 delete_outdated_data)."""
        toh = page.time_stamp % 3600 if page.time_stamp else None
        ts = page.time_stamp
        for mid in range(N_MESSAGE_IDS):
            if self._received_pids[mid] and ts and \
                    ts - self._timestamps[mid] > 150:
                self._received_pids[mid].clear()
                self._C[mid] = 0
        del toh

    # -- MT1 decode -------------------------------------------------------

    def _decode_mt1(self, mid: int, message_size: int,
                    tow: int) -> HasData | None:
        received = self._received_pids[mid]
        erasures = [i - 1 for i in range(1, message_size + 1) if i not in received]
        erasures += [i - 1 for i in range(INFO_VECTOR_LEN + 1, ENCODED_BLOCK + 1)
                     if i not in received]
        if len(erasures) > ENCODED_BLOCK - INFO_VECTOR_LEN:
            self._received_pids[mid].clear()
            self._C[mid] = 0
            return None
        M = np.zeros((INFO_VECTOR_LEN, OCTETS_IN_SUBPAGE), dtype=np.uint8)
        for col in range(OCTETS_IN_SUBPAGE):
            n_corr, decoded = self._rs.decode(self._C[mid, :, col], erasures)
            if n_corr < 0:
                return None
            M[:, col] = decoded[:INFO_VECTOR_LEN]
        bits = "".join(format(b, "08b")
                       for b in M[:message_size].reshape(-1))
        # reset state for this message id
        self._received_pids[mid].clear()
        self._C[mid] = 0
        data = HasData()
        data.tow = tow
        self._read_mt1_header(data, bits[:32])
        if data.header.toh > MAX_TOH:
            return None
        try:
            ok = self._read_mt1_body(data, bits[32:])
        except ValueError:
            return None
        if not ok:
            return None
        if data.header.mask_flag:
            self._stored_masks[data.header.mask_id] = data
        return data

    @staticmethod
    def _read_mt1_header(data: HasData, header_bits: str) -> None:
        r = _BitReader(header_bits)
        h = data.header
        h.toh = r.u(12)
        h.mask_flag = bool(r.u(1))
        h.orbit_correction_flag = bool(r.u(1))
        h.clock_fullset_flag = bool(r.u(1))
        h.clock_subset_flag = bool(r.u(1))
        h.code_bias_flag = bool(r.u(1))
        h.phase_bias_flag = bool(r.u(1))
        h.reserved = r.u(4)
        h.mask_id = r.u(5)
        h.iod_set_id = r.u(5)

    def _read_mt1_body(self, data: HasData, body_bits: str) -> bool:
        r = _BitReader(body_bits)
        h = data.header
        nsat = 0
        have_mask = False
        if h.mask_flag:
            data.Nsys = r.u(4)
            if data.Nsys != 0:
                for _ in range(data.Nsys):
                    data.gnss_id_mask.append(r.u(4))
                    sat_mask_bits = r.raw(N_SATELLITE_IDS)
                    data.satellite_mask.append(int(sat_mask_bits, 2))
                    ones_sat = sat_mask_bits.count("1")
                    nsat += ones_sat
                    sig_mask_bits = r.raw(N_SIGNAL_MASKS)
                    data.signal_mask.append(int(sig_mask_bits, 2))
                    ones_sig = sig_mask_bits.count("1")
                    cm_flag = bool(r.u(1))
                    data.cell_mask_availability_flag.append(cm_flag)
                    cm = np.zeros((ones_sat, ones_sig), dtype=bool)
                    if cm_flag:
                        for s in range(ones_sat):
                            for sig in range(ones_sig):
                                cm[s, sig] = bool(r.u(1))
                    else:
                        cm[:] = True
                    data.cell_mask.append(cm)
                    data.nav_message.append(r.u(3))
                r.u(6)  # mask-section reserved bits
            if nsat != 0:
                have_mask = True
        else:
            stored = self._stored_masks.get(h.mask_id)
            if stored is not None:
                data.Nsys = stored.Nsys
                data.gnss_id_mask = list(stored.gnss_id_mask)
                data.satellite_mask = list(stored.satellite_mask)
                data.signal_mask = list(stored.signal_mask)
                data.cell_mask_availability_flag = list(
                    stored.cell_mask_availability_flag)
                data.cell_mask = [m.copy() for m in stored.cell_mask]
                data.nav_message = list(stored.nav_message)
                nsat = sum(data.sats_in_system(i) for i in range(data.Nsys))
                have_mask = nsat != 0
        if h.orbit_correction_flag and have_mask:
            data.validity_orbit = r.u(4)
            for i in range(nsat):
                gid = data.gnss_id_for_sat(i)
                if gid == GPS_SYSTEM:
                    data.gnss_iod.append(r.u(8))
                elif gid == GALILEO_SYSTEM:
                    data.gnss_iod.append(r.u(10))
                else:
                    return False
                data.delta_radial.append(r.s(13))
                data.delta_in_track.append(r.s(12))
                data.delta_cross_track.append(r.s(12))
        if h.clock_fullset_flag and have_mask:
            data.validity_clock_fullset = r.u(4)
            for _ in range(data.Nsys):
                data.delta_clock_multiplier.append(r.u(2) + 1)
            for _ in range(nsat):
                data.delta_clock_correction.append(r.s(13))
        if h.clock_subset_flag and have_mask:
            data.validity_clock_subset = r.u(4)
            data.Nsys_sub = r.u(4)
            if data.Nsys_sub == 0:
                return False
            for _ in range(data.Nsys_sub):
                gid = r.u(4)
                data.gnss_id_clock_subset.append(gid)
                data.delta_clock_multiplier_clock_subset.append(r.u(2) + 1)
                try:
                    idx = data.gnss_id_mask.index(gid)
                except ValueError:
                    return False
                n_this = data.sats_in_system(idx)
                submask = int(r.raw(n_this), 2) if n_this else 0
                data.satellite_submask.append(submask)
                nsat_sub = bin(submask).count("1")
                corr = [r.s(13) for _ in range(nsat_sub)]
                data.delta_clock_correction_clock_subset.append(corr)
        if h.code_bias_flag and have_mask:
            data.validity_code_bias = r.u(4)
            n_sats, n_sigs = self._per_system_counts(data)
            max_sig = max(n_sigs) if n_sigs else 0
            cb = np.zeros((nsat, max_sig), dtype=np.int64)
            sat = 0
            for sys in range(data.Nsys):
                for s in range(n_sats[sys]):
                    for c in range(n_sigs[sys]):
                        if (not data.cell_mask_availability_flag[sys]) or \
                                data.cell_mask[sys][s, c]:
                            cb[sat, c] = r.s(11)
                    sat += 1
            data.code_bias = cb
        if h.phase_bias_flag and have_mask:
            data.validity_phase_bias = r.u(4)
            n_sats, n_sigs = self._per_system_counts(data)
            max_sig = max(n_sigs) if n_sigs else 0
            pb = np.zeros((nsat, max_sig), dtype=np.int64)
            pdi = np.zeros((nsat, max_sig), dtype=np.int64)
            sat = 0
            for sys in range(data.Nsys):
                for s in range(n_sats[sys]):
                    for p in range(n_sigs[sys]):
                        if (not data.cell_mask_availability_flag[sys]) or \
                                data.cell_mask[sys][s, p]:
                            pb[sat, p] = r.s(11)
                            pdi[sat, p] = r.u(2)
                    sat += 1
            data.phase_bias = pb
            data.phase_discontinuity_indicator = pdi
        return have_mask

    @staticmethod
    def _per_system_counts(data: HasData) -> tuple[list[int], list[int]]:
        n_sats, n_sigs = [], []
        for sys in range(data.Nsys):
            if data.cell_mask_availability_flag[sys]:
                n_sats.append(data.cell_mask[sys].shape[0])
                n_sigs.append(data.cell_mask[sys].shape[1])
            else:
                n_sats.append(bin(data.satellite_mask[sys]).count("1"))
                n_sigs.append(bin(data.signal_mask[sys]).count("1"))
        return n_sats, n_sigs


# ---------------------------------------------------------------------------
# Encoder (test / simulation source): MT1 message -> mother-code pages
# ---------------------------------------------------------------------------


def encode_mt1_pages(message_bits: str, message_id: int,
                     pids: list[int] | None = None) -> list[tuple[int, str]]:
    """Encode an MT1 message (header+body bit string) into HAS pages.

    Pads the message to a whole number of 53-octet pages, RS-encodes each
    octet column with the RS(255,32) mother code and returns
    [(pid, 424-bit content string)] for the requested page IDs
    (default: 1..message_size, the systematic pages).
    The matching ``message_size`` is ceil(len/424).
    """
    n_pages = (len(message_bits) + MESSAGE_BITS_PER_PAGE - 1) // MESSAGE_BITS_PER_PAGE
    if n_pages > INFO_VECTOR_LEN:
        raise ValueError("MT1 message too long for the mother code")
    padded = message_bits.ljust(n_pages * MESSAGE_BITS_PER_PAGE, "0")
    M = np.zeros((INFO_VECTOR_LEN, OCTETS_IN_SUBPAGE), dtype=np.uint8)
    for p in range(n_pages):
        page_bits = padded[p * MESSAGE_BITS_PER_PAGE:(p + 1) * MESSAGE_BITS_PER_PAGE]
        for k in range(OCTETS_IN_SUBPAGE):
            M[p, k] = int(page_bits[k * 8:(k + 1) * 8], 2)
    rs = ReedSolomon("E6B")
    C = np.zeros((ENCODED_BLOCK, OCTETS_IN_SUBPAGE), dtype=np.uint8)
    for col in range(OCTETS_IN_SUBPAGE):
        C[:, col] = rs.encode(M[:, col])
    if pids is None:
        pids = list(range(1, n_pages + 1))
    out = []
    for pid in pids:
        octets = C[pid - 1]
        out.append((pid, "".join(format(b, "08b") for b in octets)))
    return out


def build_mt1_message(*, toh: int = 0, mask_id: int = 1, iod_set_id: int = 3,
                      gnss_systems: list[dict] | None = None,
                      orbit: dict | None = None,
                      clock: dict | None = None) -> str:
    """Assemble a minimal MT1 bit string for tests/simulation.

    gnss_systems: [{gnss_id, satellite_mask (40-bit int), signal_mask
    (16-bit int), nav_message}] -> mask section. orbit: {validity,
    iods: [..], radial: [..], in_track: [..], cross_track: [..]} raw ints.
    clock: {validity, multipliers: per-system, corrections: per-sat}.
    """
    gnss_systems = gnss_systems or []
    bits = []

    def put(v: int, n: int):
        bits.append(format(v & ((1 << n) - 1), f"0{n}b"))

    put(toh, 12)
    put(1 if gnss_systems else 0, 1)
    put(1 if orbit else 0, 1)
    put(1 if clock else 0, 1)
    put(0, 1)  # clock subset
    put(0, 1)  # code bias
    put(0, 1)  # phase bias
    put(0, 4)  # reserved
    put(mask_id, 5)
    put(iod_set_id, 5)
    if gnss_systems:
        put(len(gnss_systems), 4)
        for sysd in gnss_systems:
            put(sysd["gnss_id"], 4)
            put(sysd["satellite_mask"], N_SATELLITE_IDS)
            put(sysd["signal_mask"], N_SIGNAL_MASKS)
            put(0, 1)  # no cell mask
            put(sysd.get("nav_message", 0), 3)
        put(0, 6)  # reserved
    if orbit:
        put(orbit.get("validity", 0), 4)
        for i, iod in enumerate(orbit["iods"]):
            gid = orbit["gnss_ids"][i]
            put(iod, 8 if gid == GPS_SYSTEM else 10)
            put(orbit["radial"][i], 13)
            put(orbit["in_track"][i], 12)
            put(orbit["cross_track"][i], 12)
    if clock:
        put(clock.get("validity", 0), 4)
        for m in clock["multipliers"]:
            put(m - 1, 2)
        for c in clock["corrections"]:
            put(c, 13)
    return "".join(bits)


def format_has_data(data: HasData) -> str:
    """Human-readable dump of a decoded HAS message (the reference's
    ``has_simple_printer`` role, src/algorithms/PVT/libs/has_simple_printer.cc)."""
    h = data.header
    lines = [
        "HAS MT1 message",
        f"  TOH: {h.toh} s   mask ID: {h.mask_id}   IOD set ID: {h.iod_set_id}",
        f"  sections: mask={h.mask_flag} orbit={h.orbit_correction_flag} "
        f"clock={h.clock_fullset_flag} clock_subset={h.clock_subset_flag} "
        f"code_bias={h.code_bias_flag} phase_bias={h.phase_bias_flag}",
    ]
    if data.Nsys:
        lines.append(f"  Nsys: {data.Nsys}")
        for gid, prn in data.prns():
            sysname = {GPS_SYSTEM: "GPS", GALILEO_SYSTEM: "GAL"}.get(gid, f"sys{gid}")
            lines.append(f"    {sysname} PRN {prn}")
    if data.delta_radial:
        rad = data.delta_radial_m()
        for i, r_m in enumerate(rad):
            lines.append(
                f"  orbit[{i}]: IOD {data.gnss_iod[i]} dR {r_m:+.4f} m "
                f"dIT {data.delta_in_track_m()[i]:+.4f} m "
                f"dCT {data.delta_cross_track_m()[i]:+.4f} m")
    if data.delta_clock_correction:
        dc = data.delta_clock_m()
        for i, c_m in enumerate(dc):
            lines.append(f"  clock[{i}]: {c_m:+.4f} m")
    return "\n".join(lines)

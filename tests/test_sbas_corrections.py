"""SBAS correction decoding/application (DO-229 message types).

Counterpart of the reference's rtklib_sbas.cc decode_sbstype* family:
encode synthetic correction messages, feed them through the store,
check applied pseudorange/satellite/iono corrections.
"""

import math

import numpy as np
import pytest

from gnss_sdr_tpu.telemetry.sbas_corrections import (
    SbasCorrections, encode_mt1, encode_mt18, encode_mt2, encode_mt25_v1,
    encode_mt26, igp_band_table)


PRNS = [3, 7, 11, 17, 23, 31]


def _store_with_mask():
    st = SbasCorrections()
    assert st.update(encode_mt1(PRNS, iodp=2)) == 1
    assert st.iodp == 2
    assert st.mask == PRNS
    return st


class TestFastCorrections:
    def test_mt2_applies_by_mask_slot(self):
        st = _store_with_mask()
        prcs = [1.25, -0.5, 3.0, -12.625, 0.125, 8.0] + [0.0] * 7
        udreis = [2, 3, 4, 5, 6, 7] + [14] * 7
        st.update(encode_mt2(2, iodp=2, iodf=0, prcs_m=prcs,
                             udreis=udreis), t_s=100.0)
        assert st.pseudorange_correction(3) == 1.25
        assert st.pseudorange_correction(17) == -12.625
        assert st.pseudorange_correction(31) == 8.0
        assert st.pseudorange_correction(99) is None
        # UDREI -> variance
        np.testing.assert_allclose(st.fast_variance(3), 0.1444)

    def test_wrong_iodp_rejected(self):
        st = _store_with_mask()
        st.update(encode_mt2(2, iodp=1, iodf=0,
                             prcs_m=[5.0] * 13, udreis=[1] * 13), t_s=0.0)
        assert st.pseudorange_correction(3) is None

    def test_timeout(self):
        st = _store_with_mask()
        st.update(encode_mt2(2, iodp=2, iodf=0, prcs_m=[2.0] * 13,
                             udreis=[1] * 13), t_s=100.0)
        assert st.pseudorange_correction(3, t_s=110.0) == 2.0
        assert st.pseudorange_correction(3, t_s=130.0) is None


class TestLongTerm:
    def test_mt25_velocity_code_1(self):
        st = _store_with_mask()
        st.update(encode_mt25_v1(slot=2, iod=55, dpos_m=(1.0, -2.0, 0.5),
                                 dvel_m_s=(0.004, -0.002, 0.0),
                                 daf0_s=2.0e-8, daf1_s_s=1.0e-11,
                                 t0_s=3200.0))
        got = st.satellite_correction(7, t_s=3300.0)  # slot 2 -> PRN 7
        assert got is not None
        dpos, dclk = got
        np.testing.assert_allclose(dpos[0], 1.0 + 0.004 * 100, atol=0.125)
        np.testing.assert_allclose(dpos[1], -2.0 - 0.002 * 100, atol=0.125)
        np.testing.assert_allclose(dclk, 2.0e-8 + 1.0e-11 * 100,
                                   atol=2**-31 + 100 * 2**-39)
        assert st.satellite_correction(3) is None


class TestIonoGrid:
    def test_band_geometry(self):
        for band in range(9):
            table = igp_band_table(band)
            assert len(table) == 201
        # band 4 covers lons -20..15
        lons = {lon for _, lon in igp_band_table(4)}
        assert lons == {-20.0, -15.0, -10.0, -5.0, 0.0, 5.0, 10.0, 15.0}

    def test_iono_interpolation(self):
        st = _store_with_mask()
        # mask + delays for a 2x2 patch around (40N, 2.5E): nodes at
        # lat {40,45} x lon {0,5}, all in band 4
        table = igp_band_table(4)
        nodes = {(40.0, 0.0): 2.0, (40.0, 5.0): 3.0,
                 (45.0, 0.0): 4.0, (45.0, 5.0): 5.0}
        idxs = [table.index(k) for k in nodes]
        st.update(encode_mt18(4, iodi=1, igp_indices=sorted(idxs)))
        # delays must be supplied in mask order
        ordered = sorted(nodes.items(), key=lambda kv: table.index(kv[0]))
        st.update(encode_mt26(4, block=0, iodi=1,
                              delays_m=[v for _, v in ordered],
                              giveis=[5] * 4))
        # zenith view from the patch center: pierce point == receiver
        delay = st.iono_delay(math.radians(42.5), math.radians(2.5),
                              elevation_rad=math.pi / 2, azimuth_rad=0.0)
        assert delay is not None
        np.testing.assert_allclose(delay, 3.5, atol=0.15)
        # low elevation increases the slant delay via the obliquity factor
        slant = st.iono_delay(math.radians(42.4), math.radians(2.5),
                              elevation_rad=math.radians(30),
                              azimuth_rad=math.pi)
        if slant is not None:  # pierce point may leave the tiny patch
            assert slant > delay

    def test_missing_grid_returns_none(self):
        st = _store_with_mask()
        assert st.iono_delay(0.5, 0.1, 1.0, 0.0) is None

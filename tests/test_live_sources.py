"""Live source tests: FIFO blocking reads, UDP datagram ingest,
timestamped file source (file_timestamp_signal_source.cc analogue)."""

import socket
import struct
import threading

import numpy as np
import pytest

from gnss_sdr_tpu.sources.live import (
    FifoSignalSource,
    FileTimestampSignalSource,
    UdpSignalSource,
)


def test_fifo_source_blocking_reads(tmp_path):
    # a regular file stands in for the pipe: FifoReader also just reads
    # a stream fd; partial-data retry is exercised by a slow writer thread
    path = tmp_path / "fifo.dat"
    path.write_bytes(b"")
    src = FifoSignalSource(path, sampling_frequency=1e6, item_type="ishort")

    data = np.arange(2000, dtype=np.int16)  # 1000 complex samples

    def writer():
        with open(path, "ab", buffering=0) as f:
            for k in range(0, len(data), 500):
                f.write(data[k: k + 500].tobytes())

    t = threading.Thread(target=writer)
    t.start()
    x = src.read_block(1000)
    t.join()
    assert x.dtype == np.complex64 and x.shape == (1000,)
    assert x[3] == np.complex64(6 + 7j)
    assert src.samples_delivered == 1000
    src.close()


def test_fifo_source_eof_raises(tmp_path):
    path = tmp_path / "short.dat"
    path.write_bytes(np.arange(10, dtype=np.int16).tobytes())
    src = FifoSignalSource(path, 1e6, item_type="ishort")
    with pytest.raises(EOFError):
        src.read_block(100, max_retries=3)
    src.close()


def test_udp_source_roundtrip():
    src = UdpSignalSource(port=0, sampling_frequency=1e6,
                          sample_type="cshort")
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    samples = np.arange(600, dtype=np.int16)  # 300 complex samples
    for k in range(0, 600, 200):
        tx.sendto(samples[k: k + 200].tobytes(), ("127.0.0.1", src.port))
    x = src.read_block(300, timeout=5.0)
    assert x.shape == (300,)
    assert x[0] == np.complex64(0 + 1j)
    assert x[299] == np.complex64(598 + 599j)
    tx.close()
    src.close()


def test_udp_source_iq_swap():
    src = UdpSignalSource(port=0, sampling_frequency=1e6,
                          sample_type="cbyte", iq_swap=True)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(np.array([3, 7], dtype=np.int8).tobytes(),
              ("127.0.0.1", src.port))
    x = src.read_block(1, timeout=5.0)
    assert x[0] == np.complex64(7 + 3j)
    tx.close()
    src.close()


def test_file_timestamp_source(tmp_path):
    cap = tmp_path / "cap.dat"
    np.zeros(4000, dtype=np.int16).tofile(cap)  # 2000 ishort samples
    ts = tmp_path / "cap.timestamp"
    # records: (uint64 samplecount, int32 week, int32 tow_ms)
    with open(ts, "wb") as f:
        f.write(struct.pack("<QiI", 0, 2100, 345_600_000))
        f.write(struct.pack("<QiI", 1000, 2100, 345_601_000))
    src = FileTimestampSignalSource(
        cap, ts, sampling_frequency=1000.0, item_type="ishort",
        timestamp_clock_offset_ms=5.0)
    assert len(src.timetags) == 2
    t0 = src.timetag_for_sample(0)
    assert t0.week == 2100 and t0.tow_ms == pytest.approx(345_600_005.0)
    # 500 samples at 1 kHz = 500 ms past the first tag
    t = src.timetag_for_sample(500)
    assert t.tow_ms == pytest.approx(345_600_505.0)
    # after the second tag, time restarts from that tag exactly
    t = src.timetag_for_sample(1500)
    assert t.tow_ms == pytest.approx(345_601_505.0)


def test_factory_builds_live_sources(tmp_path):
    from gnss_sdr_tpu.config import InMemoryConfiguration
    from gnss_sdr_tpu.receiver.factory import make_signal_source

    conf = InMemoryConfiguration()
    conf.set_property("GNSS-SDR.internal_fs_sps", "4000000")
    conf.set_property("SignalSource.implementation",
                      "Custom_UDP_Signal_Source")
    conf.set_property("SignalSource.port", "0")
    conf.set_property("SignalSource.sample_type", "cshort")
    src = make_signal_source(conf)
    assert isinstance(src, UdpSignalSource) and src.fs == 4e6
    src.close()

    fifo = tmp_path / "p.dat"
    fifo.write_bytes(b"")
    conf.set_property("SignalSource.implementation", "Fifo_Signal_Source")
    conf.set_property("SignalSource.filename", str(fifo))
    src = make_signal_source(conf)
    assert isinstance(src, FifoSignalSource)
    src.close()


def test_file_timestamp_week_rollover(tmp_path):
    cap = tmp_path / "cap.dat"
    np.zeros(4000, dtype=np.int16).tofile(cap)
    ts = tmp_path / "cap.timestamp"
    with open(ts, "wb") as f:
        f.write(struct.pack("<QiI", 0, 2100, 604_799_900))
    src = FileTimestampSignalSource(cap, ts, sampling_frequency=1000.0,
                                    item_type="ishort")
    t = src.timetag_for_sample(200)  # +200 ms crosses the week edge
    assert t.week == 2101
    assert t.tow_ms == pytest.approx(100.0)

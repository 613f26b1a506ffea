"""Generated protobuf modules for the UDP monitor wire formats.

Regenerate with:
  protoc --python_out=. gnss_synchro.proto monitor_pvt.proto \
      nav_message.proto gps_ephemeris.proto galileo_ephemeris.proto
"""

from gnss_sdr_tpu.monitor.proto import galileo_ephemeris_pb2  # noqa: F401
from gnss_sdr_tpu.monitor.proto import gnss_synchro_pb2  # noqa: F401
from gnss_sdr_tpu.monitor.proto import gps_ephemeris_pb2  # noqa: F401
from gnss_sdr_tpu.monitor.proto import monitor_pvt_pb2  # noqa: F401
from gnss_sdr_tpu.monitor.proto import nav_message_pb2  # noqa: F401

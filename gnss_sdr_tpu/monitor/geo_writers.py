"""Position-track file writers: KML, GPX, GeoJSON.

Counterparts of /root/reference/src/algorithms/PVT/libs/
{kml_printer,gpx_printer,geojson_printer}.cc — streaming writers that
collect fixes and produce a track file.
"""

from __future__ import annotations

import json
import math
import os


class _TrackWriter:
    def __init__(self, path: str | os.PathLike):
        self.path = str(path)
        self.points: list[tuple[float, float, float]] = []  # lon, lat, h deg

    def add_fix(self, lat_rad: float, lon_rad: float, height_m: float) -> None:
        self.points.append(
            (math.degrees(lon_rad), math.degrees(lat_rad), height_m))

    def close(self) -> str:
        with open(self.path, "w", encoding="utf-8") as fh:
            fh.write(self.render())
        return self.path


class KmlWriter(_TrackWriter):
    def render(self) -> str:
        coords = "\n".join(f"{lon:.9f},{lat:.9f},{h:.3f}"
                           for lon, lat, h in self.points)
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<kml xmlns="http://www.opengis.net/kml/2.2">\n'
            "<Document><name>GNSS-SDR-TPU track</name>\n"
            "<Placemark><name>track</name><LineString>\n"
            "<altitudeMode>absolute</altitudeMode>\n"
            f"<coordinates>\n{coords}\n</coordinates>\n"
            "</LineString></Placemark>\n</Document>\n</kml>\n"
        )


class GpxWriter(_TrackWriter):
    def render(self) -> str:
        pts = "\n".join(
            f'<trkpt lat="{lat:.9f}" lon="{lon:.9f}">'
            f"<ele>{h:.3f}</ele></trkpt>"
            for lon, lat, h in self.points)
        return (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<gpx version="1.1" creator="gnss-sdr-tpu" '
            'xmlns="http://www.topografix.com/GPX/1/1">\n'
            f"<trk><name>track</name><trkseg>\n{pts}\n</trkseg></trk>\n"
            "</gpx>\n"
        )


class GeoJsonWriter(_TrackWriter):
    def render(self) -> str:
        return json.dumps({
            "type": "Feature",
            "properties": {"name": "GNSS-SDR-TPU track"},
            "geometry": {
                "type": "LineString",
                "coordinates": [[lon, lat, h] for lon, lat, h in self.points],
            },
        }, indent=1)

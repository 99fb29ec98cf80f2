"""mscal-style derived columns: hour angle, parallactic angle,
elevation — the quantities casacore's mscal TAQL extension derives
per row (reference users write ``taql_where="mscal.HA1 > 0"`` etc.;
the reference gets them free from casacore, daskms passes the TAQL
through, daskms/dask_ms.py:236-241).  Here they are plain Column
expressions over (time, direction, site) — pure row-local spherical
trigonometry in whole-stage codegen, composing into any scan with
zero shuffles.

Formulas (public: USNO GMST approximation; spherical astronomy
standards, e.g. Meeus):

    GMST_hours = 18.697374558 + 24.06570982441908 * D,  D = MJD(UT) -
                 51544.5 days        (mod 24)
    LST  = GMST + lon_east / 15
    HA   = LST * 15 - RA             (wrapped to (-180, 180])
    PA   = atan2(sin HA, tan lat * cos dec - sin dec * cos HA)
    sin el = sin lat * sin dec + cos lat * cos dec * cos HA

Accuracy: the GMST polynomial is the USNO short form (~0.1 s of time
over decades) and UT1 is approximated by UTC (< 0.9 s) — arcsecond-
class pointing math, which is what flagging/selection predicates
need; precision ephemeris work stays in casacore/astropy.  Times are
Modified-Julian-Date SECONDS (the MS TIME convention); angles are
degrees in and degrees out.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["gmst_hours", "hour_angle_deg", "parallactic_angle_deg",
           "elevation_deg"]


def _wrap(x: Column, period: float) -> Column:
    """Remainder wrapped to [0, period) — spelled with the truncated
    ``%`` twice so DuckDB's ``fmod`` mirrors it bit-exactly."""
    p = F.lit(float(period))
    return ((x % p) + p) % p


def gmst_hours(time_mjd_s: Column) -> Column:
    """Greenwich Mean Sidereal Time in hours [0, 24) from MJD(UTC)
    seconds (USNO approximation)."""
    d = time_mjd_s.cast("double") / F.lit(86400.0) - F.lit(51544.5)
    return _wrap(F.lit(18.697374558)
                 + F.lit(24.06570982441908) * d, 24.0)


def hour_angle_deg(time_mjd_s: Column, lon_deg, ra_deg) -> Column:
    """Local hour angle in degrees, wrapped to (-180, 180] (mscal
    HA1/HA2 analogue; positive west of the meridian)."""
    lst_deg = gmst_hours(time_mjd_s) * F.lit(15.0) + lon_deg
    ha = _wrap(lst_deg - ra_deg, 360.0)
    return F.when(ha > 180.0, ha - F.lit(360.0)).otherwise(ha)


def parallactic_angle_deg(time_mjd_s: Column, lon_deg, lat_deg,
                          ra_deg, dec_deg) -> Column:
    """Parallactic angle in degrees (mscal PA1/PA2 analogue) — the
    feed-rotation angle polarization calibration applies."""
    ha = F.radians(hour_angle_deg(time_mjd_s, lon_deg, ra_deg))
    lat = F.radians(lat_deg)
    dec = F.radians(dec_deg)
    return F.degrees(F.atan2(
        F.sin(ha),
        F.tan(lat) * F.cos(dec) - F.sin(dec) * F.cos(ha)))


def elevation_deg(time_mjd_s: Column, lon_deg, lat_deg,
                  ra_deg, dec_deg) -> Column:
    """Source elevation above the horizon in degrees (mscal AZEL1
    elevation analogue) — the column behind every ``elevation > X``
    selection cut."""
    ha = F.radians(hour_angle_deg(time_mjd_s, lon_deg, ra_deg))
    lat = F.radians(lat_deg)
    dec = F.radians(dec_deg)
    return F.degrees(F.asin(
        F.sin(lat) * F.sin(dec)
        + F.cos(lat) * F.cos(dec) * F.cos(ha)))

"""Free-space path loss distance estimation (SURVEY §2.3 D1/D2).

The reference computes, per observation (/root/reference/ssidentity.c:283-286,
equation comment :274-282):

    RSSI = FSPL(dB) = 20*log10(dist) + 20*log10(freq) - 27.55   (MHz, meters)
    dist = 10 ^ ((27.55 - RSSI - 20*log10(freq)) / 20)

and rounds to 2 dp at print/INSERT time (ssidentity.c:95,:99). The golden
rows in /root/reference/observations.db pin this: (-90, 2464) → 306.1 m,
(-88, 2464) → 243.14 m, (-84, 2464) → 153.41 m.

We compute in double (the reference's float32 would lose the 2-dp golden
match) as a pure Column expression — JVM-side, codegen-able, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fspl_distance(rssi: Column, freq_mhz: Column, *, round_dp: int | None = 2) -> Column:
    """Estimated distance in meters from RSSI (dBm) and frequency (MHz)."""
    dist = F.pow(
        F.lit(10.0),
        (F.lit(27.55) - rssi.cast("double") - 20.0 * F.log10(freq_mhz.cast("double")))
        / F.lit(20.0),
    )
    return F.round(dist, round_dp) if round_dp is not None else dist


def fspl_rssi(dist_m: Column, freq_mhz: Column) -> Column:
    """Inverse FSPL (D2): expected RSSI at a given distance/frequency.

    Algebraic inverse of ``fspl_distance``; used by fixtures and property
    tests (trilateration ground-truth generation, FIXTURES.md §6).
    """
    return (
        F.lit(27.55)
        - 20.0 * F.log10(dist_m.cast("double"))
        - 20.0 * F.log10(freq_mhz.cast("double"))
    )

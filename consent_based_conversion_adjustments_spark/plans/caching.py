"""Most-recent-only persist pins for plan-builder modules.

A registered query that returns a LAZY plan over a persisted frame
cannot release the pin inside its own call (the driver materializes
later), so each pin site instead releases the PREVIOUS pin on the next
call — capping cached storage at one frame per (pin site, JVM) instead
of accumulating one per invocation across bench loops and pytest
sessions. ``make_pin()`` builds one independent slot per call so
different query families never evict each other's frame mid-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def make_pin():
    slot: list[DataFrame] = []

    def pin(df: DataFrame) -> DataFrame:
        while slot:
            slot.pop().unpersist()
        slot.append(df.persist())
        return df

    return pin

"""Pin-ownership scope: make leak-free persist handoffs structural.

The pattern this replaces (round-8's ``pinned`` list-out-param): an
operator persists an intermediate it cannot unpersist itself — the
frame feeds several downstream consumers inside the caller's larger
computation — so it hands the pin to the caller, who must remember to
release it after materializing their own decision.  A bare list works
but is easy to misuse (forgotten release = one cached frame leaked
per call, exactly the repeated-delta-ingest leak ADVICE r8 flagged).

:class:`PinScope` makes the ownership explicit and the release
structural: it duck-types the ``pinned`` list parameter (``append``),
also registers the caller's own persists (:meth:`pin`), and releases
everything exactly once on scope exit — including on the error path —
then verifies nothing it owned is still cached.

Usage::

    with PinScope() as pins:
        batch = pins.pin(delta.join(seen, id_col, "left_anti"))
        confirmed = jaccard_verify(union_df, cands, pinned=pins)
        decision = confirmed.collect()          # pins still warm here
    # every pin released; `decision` is driver-side data

Reference parity: none — cache-lifetime discipline for the
incremental-index tier this engine adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class PinScope:
    """Collects persist() pins and releases them exactly once.

    * ``append(df)`` — take ownership of an ALREADY-persisted frame
      (list duck-type: pass the scope itself wherever a ``pinned``
      list-out-param is accepted, e.g. ``jaccard_verify``).
    * ``pin(df)`` — persist ``df`` and take ownership; returns ``df``.
    * ``release()`` — unpersist every owned frame (idempotent); raises
      ``RuntimeError`` if an owned frame is somehow still cached
      afterwards, so a leak fails loudly instead of accumulating.

    Works as a context manager; the scope releases on ``__exit__``
    even when the body raises.
    """

    def __init__(self) -> None:
        self._pins: list[DataFrame] = []
        self.released = False

    def append(self, df: DataFrame) -> DataFrame:
        if self.released:
            raise RuntimeError("PinScope already released — pinning "
                               "after release would leak the cache")
        self._pins.append(df)
        return df

    def pin(self, df: DataFrame) -> DataFrame:
        df.persist()
        return self.append(df)

    def release(self) -> None:
        if self.released:
            return
        pins, self._pins = self._pins, []
        self.released = True
        for df in pins:
            df.unpersist()
        still = [df for df in pins
                 if df.storageLevel.useMemory or df.storageLevel.useDisk]
        if still:
            raise RuntimeError(
                f"PinScope.release: {len(still)} frame(s) still report "
                "a storage level after unpersist — cache leak")

    def __enter__(self) -> "PinScope":
        return self

    def __exit__(self, *exc) -> None:
        self.release()

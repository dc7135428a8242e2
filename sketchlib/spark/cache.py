"""One-slot persisted-frame cache shared by operators whose RETURNED
plan still references an internally-persisted frame lazily.

The contract (established by tfidf_keywords, reused by overlap_matrix
and unigram_logprob): each op holds at most ONE cached internal frame
per slot — a new call releases the previous one, so loops over corpora
never accumulate session-lifetime cached frames; callers release the
final one explicitly once its consumer has been materialized.
Releasing early is always safe — an unevaluated consumer just
recomputes the frame instead of reading the cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class SingleSlotCache:
    """Holds at most one persisted DataFrame; ``hold`` releases the
    previous occupant, ``release`` unpersists and empties the slot."""

    __slots__ = ("_df",)

    def __init__(self) -> None:
        self._df: DataFrame | None = None

    @property
    def held(self) -> DataFrame | None:
        """The currently-cached frame (None when the slot is empty)."""
        return self._df

    def hold(self, df: DataFrame) -> None:
        self.release()
        self._df = df

    def release(self) -> None:
        if self._df is not None:
            self._df.unpersist()
            self._df = None

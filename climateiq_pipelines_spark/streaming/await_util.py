"""Shared streaming-query wait with a LOUD timeout.

Round-12 review: every streaming key ran ``query.awaitTermination(N)``
and ignored the boolean — on a slow host the availableNow trigger can
outlive the timeout, the ``finally`` stops the query mid-batch, and the
key returns an empty (complete-mode) or partial (append-mode) memory
sink as its ANSWER.  The driver would then report a hash mismatch that
diagnoses as a wrong-answer engine bug instead of a host timeout.  A
timeout must fail loudly and attributably.
"""

from __future__ import annotations


def await_or_raise(query, seconds: int) -> None:
    """awaitTermination(seconds), raising TimeoutError on expiry instead
    of letting the caller read a partial sink."""
    if not query.awaitTermination(seconds):
        raise TimeoutError(
            f"streaming query {query.name or query.id} did not terminate "
            f"within {seconds}s — refusing to read a partial sink"
        )

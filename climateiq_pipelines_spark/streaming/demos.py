"""Round-3 streaming demo keys — loaded LAST so they don't displace the
mandated families from the driver's 50-entry correctness window (see
plans.load_all). Populated by the round-3 build: sliding-window and
dedup-within-watermark readStream demos plus the span-watermark batch
twin.
"""

from __future__ import annotations

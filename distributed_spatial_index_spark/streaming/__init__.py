"""Structured Streaming variants (SURVEY.md §2.7): windowed stream-static
spatial join with event-time watermark, and the stateful segment former
(applyInPandasWithState) mirroring the reference's per-TID keyed state."""

"""Training-data pipeline queries over documents/embeddings/events:
deduplication, similarity search, text analysis, multimodal plumbing,
sessionization. Populated incrementally.
"""

from __future__ import annotations

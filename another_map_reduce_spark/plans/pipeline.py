"""LLM-pipeline query suite — [extension] operators (SURVEY.md §7 M4).

Dedup / similarity / text-analysis / multimodal over documents and
embeddings.  Populated incrementally (M4).
"""

from __future__ import annotations

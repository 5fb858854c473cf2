"""Multi-turn extraction chat (reference: gemini_service.py:584-604
`create_extraction_chat` — a Gemini chat session "for clarifying ambiguous
extractions / follow-up questions"; the reference never wires it to a
route).

The local analog is a deterministic, grounded Q&A session over one
extraction's artifacts: its fields (key/value/confidence/validation) and
its OCR text. No generation — answers quote the extraction, so they cannot
hallucinate values. The API exposes it at
`POST /api/extractions/{id}/chat` (beyond the reference, which kept the
chat service-internal).

Understood intents:
  - field lookup:   "what is the invoice number?", "total amount?"
  - field listing:  "what fields did you find", "list fields"
  - low confidence: "which fields are uncertain / need review"
  - text search:    "find <text>" or any other message — OCR line search
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def _norm(s: str) -> str:
    return " ".join(re.sub(r"[^a-z0-9 ]", " ", s.lower()).split())


def _tokens(s: str) -> set[str]:
    return set(_norm(s).split())


_STOP = _tokens(
    "what is the a an of for my this that are was please tell me show give"
    " whats value did you find extract extracted it"
)

_LIST_RE = re.compile(
    r"\b(list|show|enumerate)\b.*\bfields?\b|\bwhat\b.*\b(fields?|found|extract)",
    re.I,
)
_UNCERTAIN_RE = re.compile(
    r"\b(uncertain|unsure|low.conf|review|doubt|confident)\b", re.I
)
_FIND_RE = re.compile(r"\b(?:find|search|where(?:'s| is)?|locate)\b\s*(.*)", re.I)


@dataclass
class ChatTurn:
    role: str  # "user" | "assistant"
    text: str


@dataclass
class ExtractionChat:
    """Stateful multi-turn session over one extraction."""

    fields: list[dict]  # {field_key, field_value, confidence, field_type, ...}
    ocr_text: str = ""
    history: list[ChatTurn] = field(default_factory=list)

    def send(self, message: str) -> dict:
        """-> {"reply": str, "matched_fields": [field_key, ...]}"""
        self.history.append(ChatTurn("user", message))
        reply, matched = self._answer(message.strip())
        self.history.append(ChatTurn("assistant", reply))
        return {"reply": reply, "matched_fields": matched}

    # ---- intent handlers ----

    def _answer(self, message: str) -> tuple[str, list[str]]:
        if not message:
            return "Ask about a field, or 'list fields'.", []
        if _LIST_RE.search(message):
            return self._list_fields()
        if _UNCERTAIN_RE.search(message):
            return self._uncertain_fields()
        m = _FIND_RE.search(message)
        looked_up = self._field_lookup(message)
        if looked_up is not None:
            return looked_up
        if m and m.group(1).strip():
            return self._search_text(m.group(1))
        return self._search_text(message)

    def _list_fields(self) -> tuple[str, list[str]]:
        if not self.fields:
            return "No fields were extracted from this document.", []
        lines = [
            f"- {f['field_key']}: {f['field_value']!r}"
            f" ({round(float(f.get('confidence', 0)) * 100)}%)"
            for f in self.fields
        ]
        return (
            f"{len(self.fields)} field(s) extracted:\n" + "\n".join(lines),
            [f["field_key"] for f in self.fields],
        )

    def _uncertain_fields(self) -> tuple[str, list[str]]:
        low = [
            f for f in self.fields
            if float(f.get("confidence", 0.0)) < 0.6
            or f.get("validation_status") in ("invalid", "warning")
        ]
        if not low:
            return "All fields look confident and valid.", []
        lines = [
            f"- {f['field_key']}: {f['field_value']!r}"
            f" ({round(float(f.get('confidence', 0)) * 100)}%)"
            for f in low
        ]
        return (
            "These fields deserve review:\n" + "\n".join(lines),
            [f["field_key"] for f in low],
        )

    def _field_lookup(self, message: str) -> tuple[str, list[str]] | None:
        q = _tokens(message) - _STOP
        if not q:
            return None
        best, best_score = None, 0.0
        for f in self.fields:
            kt = _tokens(f["field_key"])
            if not kt:
                continue
            overlap = len(q & kt) / len(kt)
            if overlap > best_score:
                best, best_score = f, overlap
        if best is None or best_score < 0.99:  # require the full key asked
            # partial overlap still useful when nothing else matches
            if best is not None and best_score >= 0.5:
                conf = round(float(best.get("confidence", 0)) * 100)
                return (
                    f"Closest field: {best['field_key']} ="
                    f" {best['field_value']!r} ({conf}% confidence).",
                    [best["field_key"]],
                )
            return None
        conf = round(float(best.get("confidence", 0)) * 100)
        return (
            f"{best['field_key']}: {best['field_value']!r}"
            f" ({conf}% confidence).",
            [best["field_key"]],
        )

    def _search_text(self, query: str) -> tuple[str, list[str]]:
        q = _tokens(query) - _STOP
        if not q:
            return "Ask about a field, or 'list fields'.", []
        hits = [
            ln for ln in self.ocr_text.splitlines()
            if ln.strip() and q & _tokens(ln)
        ][:5]
        if not hits:
            return (
                f"No OCR line mentions {' '.join(sorted(q))!r}.", []
            )
        return ("Matching OCR lines:\n" + "\n".join(f"> {h}" for h in hits),
                [])

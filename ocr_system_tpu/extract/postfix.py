"""Typed post-correction of extracted values and keys.

The reference pipeline repairs OCR noise in TWO places: Gemini itself
normalizes values it re-types (gemini_service.py's structured JSON pass),
and validation_service suggests corrections (email space-strip, ISO date
rewrite). The local analog applies the SAFE, type-gated subset at field
emission so serving, eval, and the box-fed path all inherit it:

- digit-context confusion repair: inside digit-dominant values of numeric
  types, OCR letter/digit confusions (O->0, l->1, S->5, B->8, Z->2) flip
  only when a neighbor is a digit — 'carios' in a name stays put, '915O7'
  in a phone becomes 91507. Measured on diag_extract_pipeline: VAL_NOISE
  is dominated by exactly these single-char flips.
- email space removal: emails never contain spaces; rec occasionally
  splits 'acme. com' at a crop boundary.
- key snapping: when the form type is a KNOWN family, extracted keys snap
  to the family's canonical field lexicon on near match (CER <= 0.25,
  unique winner) — the local analog of sending template.expected_fields to
  Gemini (reference extraction_service.py template prompt). Unknown forms
  (random/Devanagari keys) have no lexicon and are left untouched.
"""

from __future__ import annotations

_DIGIT_CONF = {
    "O": "0", "o": "0", "l": "1", "I": "1", "|": "1",
    "S": "5", "B": "8", "Z": "2",
}
_NUMERIC_TYPES = {"phone", "number", "date", "currency"}
_SEP = set(" -+()./,:")


def autocorrect_value(value: str, field_type: str) -> str:
    """Safe, type-gated OCR repair of a field value (see module doc)."""
    if not value:
        return value
    if field_type == "email" or ("@" in value and "." in value):
        return value.replace(" ", "") if "@" in value else value
    if field_type not in _NUMERIC_TYPES:
        return value
    digits = sum(c.isdigit() for c in value)
    if digits < 2 or digits < 0.4 * sum(c not in _SEP for c in value):
        return value  # not digit-dominant: 'EUR', 'N/A', prose values
    chars = list(value)
    for i, c in enumerate(chars):
        if c not in _DIGIT_CONF:
            continue
        prev = next((x for x in reversed(chars[:i]) if x != " "), "")
        nxt = next((x for x in chars[i + 1:] if x != " "), "")
        if prev.isdigit() or nxt.isdigit():
            chars[i] = _DIGIT_CONF[c]
    return "".join(chars)


def _cer(a: str, b: str) -> float:
    """Plain Levenshtein / len(a); local to avoid an eval import cycle."""
    if a == b:
        return 0.0
    if not a or not b:
        return 1.0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1] / len(a)


def clean_key(key: str) -> str:
    """Strip presentation artifacts from an extracted key: trailing ':'
    and dot-leader runs ('Signature..........' labels a signature line;
    the dots are the ruled line, not the key)."""
    import re

    return re.sub(r"[.\s]*\.{2,}[.\s]*$", "", key.rstrip(":").strip()).strip()


def snap_key(key: str, lexicon: list[str], max_cer: float = 0.25) -> str:
    """Snap a noisy key to its unique near match in a canonical lexicon.

    'monthily fee' -> 'Monthly Fee' when the form family is known. Returns
    the ORIGINAL key when no lexicon entry is near, when two are equally
    near (ambiguous), or when the key already matches exactly."""
    if not key or not lexicon:
        return key
    kl = " ".join(key.lower().split())
    best: tuple[float, str] | None = None
    second = 2.0
    for cand in lexicon:
        c = _cer(" ".join(cand.lower().split()), kl)
        if best is None or c < best[0]:
            second = best[0] if best else 2.0
            best = (c, cand)
        elif c < second:
            second = c
    if best is None or best[0] > max_cer:
        return key
    if best[0] > 0.0 and second <= max_cer:
        return key  # two near candidates: ambiguous, keep OCR reading
    return best[1] if best[0] > 0.0 else key


# canonical field lexicons per KNOWN form family — product knowledge, the
# same role as FormTemplate.expected_fields (db seed templates carry these
# too). Kept in extract/ so the extractor has no training-module import.
FORM_KEY_LEXICON: dict[str, list[str]] = {
    "Invoice": [
        "Invoice Number", "Invoice Date", "Due Date", "Vendor", "Customer",
        "Subtotal", "Tax", "Total Amount", "Payment Method", "Email",
        "Phone", "Billing Address",
    ],
    "Receipt": [
        "Receipt Number", "Date", "Cashier", "Amount Paid", "Change",
        "Payment Method", "Store Phone",
    ],
    "Application Form": [
        "Full Name", "Date of Birth", "Email", "Phone Number", "Address",
        "Position", "Signature", "Date", "Referred By",
    ],
    "Medical Form": [
        "Patient Name", "Date of Birth", "Insurance ID", "Physician",
        "Allergies", "Blood Type", "Emergency Contact", "Visit Date",
    ],
    "Survey": [
        "Respondent", "Date", "Satisfied", "Would Recommend", "Comments",
        "Contact Email",
    ],
    "Purchase Order": [
        "PO Number", "Order Date", "Supplier", "Ship To", "Total",
        "Approved By", "Delivery Date",
    ],
    "Tax Form": [
        "Tax Year", "Taxpayer Name", "Filing Status", "Gross Income",
        "Deductions", "Tax Due", "Signature",
    ],
    "Contract": [
        "Party A", "Party B", "Effective Date", "Term", "Monthly Fee",
        "Signature", "Witness",
    ],
}

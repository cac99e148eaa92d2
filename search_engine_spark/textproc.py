"""Text-processing kernels: tokenizer + term-normalization rules.

Pure Python/numpy — no Spark imports.  These kernels are shared by
(a) the single-node oracle (``oracle.py``) and (b) the Arrow UDFs in
``plans/tokenize.py``, which is what guarantees the Spark pipeline and
the oracle produce identical term streams.

Semantics re-express the reference engine's parser rule-set
(see /root/reference Parser.java:41-735 for the parity surface):

* N1  tokenizer: ~25 unconditional delimiters plus contextual keeps
  for ``:`` inside dd:dd, ``,`` inside d,ddd, ``.``/``/`` inside
  numbers, ``'`` before a letter, ``-`` per dash rules, ``$`` before
  a digit, and the specials ``U.S.`` / ``A.M`` / ``P.M`` / ``ST.``
  (Parser.java:447-475, helpers :615-687).
* N2-N12 normalization rules over the token stream with <=3-token
  lookahead (Parser.java:62-381).
* N13 case folding with in-document uppercase demotion
  (Parser.java:400-431), N14 Porter stemming (porter.py), N15 the
  positional "important" flag (Parser.java:485-487).

Deliberate, documented divergences from the reference (all are cases
where the reference would throw mid-parse; we define total-function
behaviour instead):

* out-of-range look-behind at text position 0/1 is treated as a space
  for ``$`` and as a non-digit for ``:`` and ``,``;
* malformed numeric lookahead (e.g. ``12:3x``) skips the rule instead
  of raising;
* tokens whose arithmetic rewrite cannot parse (``3/0`` via the
  K/M/B path) are kept verbatim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .porter import porter_stem

# --------------------------------------------------------------------------
# Low-level predicates (Java semantics)
# --------------------------------------------------------------------------

_DIGITS = frozenset("0123456789")


def _is_digit(c: str) -> bool:
    return c in _DIGITS


def is_number(s: str) -> bool:
    """Comma-stripped parseable-as-double check."""
    t = s.replace(",", "")
    if not t or "_" in t:
        return False
    try:
        float(t)
    except ValueError:
        return False
    return True


def parse_number(s: str) -> float:
    return float(s.replace(",", ""))


def is_number_case(s: str) -> bool:
    """True when the token can participate in a numeric rule: it
    contains one of ``% $ :`` or has no letters at all."""
    if "%" in s or "$" in s or ":" in s:
        return True
    return not any(c.isalpha() for c in s)


def lower_than_million(s: str) -> bool:
    t = s.replace(",", "").replace("$", "", 1)
    if not t or "_" in t:
        return False
    try:
        return float(t) < 1_000_000
    except ValueError:
        return False


def java_double_str(d: float) -> str:
    """Render a float the way Java's ``Double.toString`` does:
    plain decimal for 1e-3 <= |d| < 1e7, computerized scientific
    notation (``d.dddEn``) otherwise, always with >= 1 fractional
    digit.  Needed because several numeric rewrite rules embed the
    printed double in the emitted term."""
    if d != d:
        return "NaN"
    if d == float("inf"):
        return "Infinity"
    if d == float("-inf"):
        return "-Infinity"
    neg = d < 0 or (d == 0 and str(d)[0] == "-")
    a = abs(d)
    sign = "-" if neg else ""
    if a == 0:
        return sign + "0.0"
    # shortest round-trip digits from Python's repr
    rep = repr(a)
    if "e" in rep or "E" in rep:
        mant, _, exp_s = rep.lower().partition("e")
        exp10 = int(exp_s)
    else:
        mant, exp10 = rep, 0
    if "." in mant:
        int_part, frac_part = mant.split(".")
    else:
        int_part, frac_part = mant, ""
    digits = (int_part + frac_part).lstrip("0")
    # decimal exponent: position of the decimal point relative to the
    # first significant digit
    point = len(int_part) + exp10
    lead_zeros = len(int_part + frac_part) - len(digits)
    point -= lead_zeros
    digits = digits.rstrip("0") or "0"
    if 1e-3 <= a < 1e7:
        if point <= 0:
            out = "0." + "0" * (-point) + digits
        elif point >= len(digits):
            out = digits + "0" * (point - len(digits)) + ".0"
        else:
            out = digits[:point] + "." + digits[point:]
        return sign + out
    # scientific: one digit before the point
    frac = digits[1:] or "0"
    return f"{sign}{digits[0]}.{frac}E{point - 1}"


def _strip_dot_zero(s: str) -> str:
    """Java pattern: drop a trailing ``.0`` when it is the entire
    fractional part (``substring(indexOf('.')) == ".0"``)."""
    i = s.find(".")
    if i >= 0 and s[i:] == ".0":
        return s[:i]
    return s


def is_k_m_b(number: str) -> str:
    """Scale a bare numeric token: >=1000 -> K, >=1e6 -> M, >=1e9 -> B
    (commas preserved for small numbers, Java double rendering for
    the scaled value)."""
    t = number.replace(",", "")
    try:
        num = float(t)
    except ValueError:
        return number  # divergence: reference would raise
    if num < 1000:
        return number
    if num < 1_000_000:
        scaled, suffix = num / 1000, "K"
    elif num < 1_000_000_000:
        scaled, suffix = num / 1_000_000, "M"
    else:
        scaled, suffix = num / 1_000_000_000, "B"
    s = java_double_str(scaled)
    if s.endswith(".0"):
        s = s[:-2]
    return s + suffix


# --------------------------------------------------------------------------
# N1: tokenizer
# --------------------------------------------------------------------------

_ALWAYS_DELIMS = frozenset(" \\[]!@#^&*()+=`~?\";{}|<>\n_")
_CONDITIONAL = frozenset(":%/'$-.,")
# fast path: split on runs of unconditional delimiters first
_ALWAYS_RE = re.compile("[" + re.escape("".join(sorted(_ALWAYS_DELIMS))) + "]+")
_HAS_CONDITIONAL_RE = re.compile("[:%/'$\\-.,]")


def _slash_ok(cur: str, c: str) -> bool:
    if cur == "0" or c == "0" or cur == "" or not _is_digit(c):
        return False
    for i, ch in enumerate(cur):
        if i == 0 and ch in "-$":
            continue
        if ch == ",":
            continue
        if not _is_digit(ch):
            return False
    return True


def _apostrophe_ok(cur: str, c: str) -> bool:
    return bool(cur) and c.isalpha()


def _dot_ok(cur: str, c: str) -> bool:
    if cur == "U" and c == "S":
        return True
    if cur == "U.S" and c == " ":
        return True
    up = cur.upper()
    if up in ("A", "P") and c.upper() == "M":
        return True
    if up in ("A.M", "P.M") and c == " ":
        return True
    if up == "ST" and (c == " " or c.upper() == "P"):
        return True
    if not _is_digit(c):
        return False
    for i, ch in enumerate(cur):
        if i == 0 and ch in "-$":
            continue
        if ch == ",":
            continue
        if not _is_digit(ch):
            return False
    return True


def _dash_ok(cur: str, c: str) -> bool:
    if c == " ":
        return False
    if cur == "":
        return _is_digit(c) or c == "$"
    return _is_digit(c) or c.isalpha() or c == "$"


def _tokenize_segment(text: str, start: int, end: int, out: list[str]) -> None:
    """Char-by-char contextual split of text[start:end]; look-behind /
    look-ahead use *global* text positions exactly as the reference
    does."""
    n = len(text)
    buf: list[str] = []

    def flush() -> None:
        if buf:
            out.append("".join(buf))
            buf.clear()

    i = start
    while i < end:
        s = text[i]
        delim = False
        if s == ":":
            delim = n > i + 2 and not (
                i >= 2
                and _is_digit(text[i - 1])
                and _is_digit(text[i - 2])
                and _is_digit(text[i + 1])
                and _is_digit(text[i + 2])
            )
        elif s == "%":
            delim = not is_number("".join(buf))
        elif s == "/":
            delim = n > i + 1 and not _slash_ok("".join(buf), text[i + 1])
        elif s == "'":
            delim = n > i + 1 and not _apostrophe_ok("".join(buf), text[i + 1])
        elif s == "$":
            prev = text[i - 1] if i > 0 else " "
            delim = n > i + 1 and not (prev in " -" and _is_digit(text[i + 1]))
        elif s == "-":
            delim = n > i + 1 and not _dash_ok("".join(buf), text[i + 1])
        elif s == ".":
            delim = n > i + 1 and not _dot_ok("".join(buf), text[i + 1])
        elif s == ",":
            delim = not buf or (
                n > i + 3
                and not (
                    i >= 1
                    and _is_digit(text[i - 1])
                    and _is_digit(text[i + 1])
                    and _is_digit(text[i + 2])
                    and _is_digit(text[i + 3])
                )
            )
        if delim:
            flush()
        else:
            buf.append(s)
        i += 1
    flush()


def tokenize(text: str) -> list[str]:
    """Split text into raw tokens (N1).  Fast path: segments between
    unconditional delimiters that contain no conditional characters
    are emitted whole; only segments with ``:%/'$-.,`` take the
    contextual char loop."""
    out: list[str] = []
    pos = 0
    for m in _ALWAYS_RE.finditer(text):
        if m.start() > pos:
            seg = text[pos : m.start()]
            if _HAS_CONDITIONAL_RE.search(seg):
                _tokenize_segment(text, pos, m.start(), out)
            else:
                out.append(seg)
        pos = m.end()
    if pos < len(text):
        seg = text[pos:]
        if _HAS_CONDITIONAL_RE.search(seg):
            _tokenize_segment(text, pos, len(text), out)
        else:
            out.append(seg)
    return out


def tokenize_spec(text: str) -> list[str]:
    """Reference-shaped single char loop; used in tests as the spec
    that the fast-path ``tokenize`` must agree with."""
    out: list[str] = []
    _tokenize_segment_spec(text, out)
    return out


def _tokenize_segment_spec(text: str, out: list[str]) -> None:
    n = len(text)
    buf: list[str] = []
    i = 0
    while i < n:
        s = text[i]
        if s in _ALWAYS_DELIMS:
            delim = True
        elif s == ":":
            delim = n > i + 2 and not (
                i >= 2
                and _is_digit(text[i - 1])
                and _is_digit(text[i - 2])
                and _is_digit(text[i + 1])
                and _is_digit(text[i + 2])
            )
        elif s == "%":
            delim = not is_number("".join(buf))
        elif s == "/":
            delim = n > i + 1 and not _slash_ok("".join(buf), text[i + 1])
        elif s == "'":
            delim = n > i + 1 and not _apostrophe_ok("".join(buf), text[i + 1])
        elif s == "$":
            prev = text[i - 1] if i > 0 else " "
            delim = n > i + 1 and not (prev in " -" and _is_digit(text[i + 1]))
        elif s == "-":
            delim = n > i + 1 and not _dash_ok("".join(buf), text[i + 1])
        elif s == ".":
            delim = n > i + 1 and not _dot_ok("".join(buf), text[i + 1])
        elif s == ",":
            delim = not buf or (
                n > i + 3
                and not (
                    i >= 1
                    and _is_digit(text[i - 1])
                    and _is_digit(text[i + 1])
                    and _is_digit(text[i + 2])
                    and _is_digit(text[i + 3])
                )
            )
        else:
            delim = False
        if delim:
            if buf:
                out.append("".join(buf))
                buf.clear()
        else:
            buf.append(s)
        i += 1
    if buf:
        out.append("".join(buf))


# --------------------------------------------------------------------------
# N2-N12: normalization rules (token stream -> emitted terms)
# --------------------------------------------------------------------------

MONTHS: dict[str, int] = {}
for _n, _names in {
    1: ("JAN", "Jan", "JANUARY", "January"),
    2: ("FEB", "Feb", "February", "FEBRUARY"),
    3: ("Mar", "MAR", "March", "MARCH"),
    4: ("Apr", "APR", "April", "APRIL"),
    5: ("May", "MAY"),
    6: ("June", "JUNE"),
    7: ("July", "JULY"),
    8: ("Aug", "AUG", "August", "AUGUST"),
    9: ("Sept", "SEPT", "September", "SEPTEMBER"),
    10: ("Oct", "OCT", "October", "OCTOBER"),
    11: ("Nov", "NOV", "November", "NOVEMBER"),
    12: ("Dec", "DEC", "December", "DECEMBER"),
}.items():
    for _name in _names:
        MONTHS[_name] = _n

_SCALES = frozenset(("thousand", "million", "billion", "trillion"))


def _java_split_dash(s: str) -> list[str]:
    """Java String.split("-"): trailing empty strings are dropped."""
    parts = s.split("-")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _is_range(s: str) -> bool:
    parts = _java_split_dash(s)
    if len(parts) > 3:
        return False
    if len(parts) < 3:
        return True
    return not (is_number(parts[0]) or is_number(parts[1]) or is_number(parts[2]))


def _dash_range_ok(cur: str) -> bool:
    return (
        "-" in cur
        and "--" not in cur
        and cur != "-"
        and not cur.startswith("-")
        and cur.index("-") + 1 != len(cur)
        and _is_range(cur)
    )


def _fmt_scaled(value: float, suffix: str) -> str:
    s = _strip_dot_zero(java_double_str(value))
    return s + suffix


def _try_hhmm(cur: str) -> tuple[int, int] | None:
    if cur[0:2].isdigit() and cur[3:5].isdigit():
        return int(cur[0:2]), int(cur[3:5])
    return None


@dataclass
class _Emit:
    term: str
    index: int
    consumed: int
    to_stem: bool = False


def _match_rule(tokens: list[str], i: int) -> _Emit | None:
    """Try every numeric / dash / date rule at position i.  Returns the
    emitted rewrite or None when the token falls through to the plain
    word path."""
    cur = tokens[i]
    n = len(tokens)

    def nxt(d: int) -> str | None:
        return tokens[i + d] if n - (i + d) > 0 else None

    if is_number_case(cur):
        # ---- N2/N3: HH:MM [AM|PM] and percent-range --------------------
        if (
            len(cur) >= 5
            and cur[2] == ":"
            and is_number(cur[0:2] + cur[3:5])
            and (len(cur) == 5 or cur[5].lower() in "pa")
        ):
            lower = cur.lower()
            n1 = nxt(1)
            if n1 is not None and n1.lower() in ("a.m.", "am", "p.m.", "pm"):
                half = "AM" if n1.lower() in ("a.m.", "am") else "PM"
                return _Emit(f"{cur} {half}", i, 2)
            if "am" in lower or "pm" in lower:
                if "am" in lower:
                    return _Emit(cur[: lower.index("a")] + " AM", i, 1)
                return _Emit(cur[: lower.index("p")] + " PM", i, 1)
            hhmm = _try_hhmm(cur)
            if hhmm is not None:
                hh, mm = hhmm
                if hh <= 24 and mm < 60:
                    if hh < 12:
                        return _Emit(f"{cur} AM", i, 1)
                    if hh == 24:
                        return _Emit(f"00:{cur[3:5]} AM", i, 1)
                    return _Emit(f"{cur} PM", i, 1)
                if hh + mm == 100:
                    return _Emit(f"{hh}%-{mm}%", i, 1)
            return _Emit(cur, i, 1)

        # ---- N4: numeric dash range ------------------------------------
        if _dash_range_ok(cur):
            return _Emit(cur.lower().rstrip("-"), i, 1, to_stem=True)

        # ---- N5: percent -----------------------------------------------
        n1 = nxt(1)
        if ("%" in cur and is_number(cur[: cur.index("%")])) or (
            is_number(cur) and n1 is not None and n1.lower() in ("percent", "percentage")
        ):
            if "%" in cur:
                p = cur.index("%")
                term = cur[: p + 1] if cur[p + 1 :] else cur
                return _Emit(term, i, 1)
            return _Emit(cur + "%", i, 2)

        # ---- N6: "DD Month" --------------------------------------------
        if is_number(cur) and n1 is not None and n1 in MONTHS:
            month = MONTHS[n1]
            day = int(parse_number(cur))
            day_s = f"0{day}" if day < 10 else str(day)
            return _Emit(f"{month:02d}-{day_s}", i, 2)

        # ---- N7: price < 1M ---------------------------------------------
        n2 = nxt(2)
        frac_cur = "/" in cur and is_number(cur.replace("/", ""))
        if lower_than_million(cur) and (
            ("$" in cur and is_number(cur.replace("$", "")))
            or ((frac_cur or is_number(cur)) and n1 is not None and n1.lower() == "dollars")
            or (
                is_number(cur)
                and n2 is not None
                and "/" in n1
                and is_number(n1.replace("/", ""))
                and n2.lower() == "dollars"
            )
        ):
            if "$" in cur:
                return _Emit(cur.replace("$", "") + " Dollars", i, 1)
            if n1.lower() == "dollars":
                return _Emit(f"{cur} Dollars", i, 2)
            return _Emit(f"{cur} {n1} Dollars", i, 3)

        # ---- N8: price >= 1M ---------------------------------------------
        n3 = nxt(3)
        if ("$" in cur and is_number(cur.replace("$", ""))) or (
            is_number(cur)
            and (
                (n1 is not None and n1.lower() == "dollars")
                or (n2 is not None and n1.lower() in ("m", "bn") and n2.lower() == "dollars")
                or (
                    n3 is not None
                    and n1.lower() in ("million", "billion", "trillion")
                    and n2 == "U.S."
                    and n3.lower() == "dollars"
                )
            )
        ):
            if "$" in cur:
                bare = cur.replace("$", "")
                if n1 is not None and n1.lower() == "million":
                    return _Emit(f"{bare} M Dollars", i, 2)
                if n1 is not None and n1.lower() == "billion":
                    v = _strip_dot_zero(java_double_str(1000 * parse_number(bare)))
                    return _Emit(f"{v} M Dollars", i, 2)
                if n1 is not None and n1.lower() == "trillion":
                    v = _strip_dot_zero(java_double_str(1_000_000 * parse_number(bare)))
                    return _Emit(f"{v} M Dollars", i, 2)
                v = _strip_dot_zero(java_double_str(parse_number(bare) / 1_000_000))
                return _Emit(f"{v} M Dollars", i, 1)
            x = 1 if (n3 is not None and n2 == "U.S." and "dollars" in n3.lower()) else 0
            if n1 is not None and (n1.lower() == "m" or n1 == "million"):
                return _Emit(f"{cur} M Dollars".replace("$", ""), i, 2 + x)
            if n1 is not None and n1.lower() in ("bn", "billion"):
                v = _strip_dot_zero(java_double_str(1000 * parse_number(cur.replace("$", ""))))
                return _Emit(f"{v} M Dollars", i, 2 + x)
            if n1 is not None and n1.lower() == "trillion":
                v = _strip_dot_zero(java_double_str(1_000_000 * parse_number(cur.replace("$", ""))))
                return _Emit(f"{v} M Dollars", i, 2 + x)
            v = _strip_dot_zero(java_double_str(parse_number(cur.replace("$", "")) / 1_000_000))
            return _Emit(f"{v} M Dollars", i, 2 + x)

        # ---- N9: number scaling ------------------------------------------
        if is_number(cur) or frac_cur:
            if "/" not in cur and (
                abs(parse_number(cur)) >= 1000
                or (n1 is not None and n1.lower() in _SCALES)
            ):
                word = n1.lower() if n1 is not None else ""
                if word == "thousand":
                    return _Emit(cur + "K", i, 2)
                if word == "million":
                    return _Emit(cur + "M", i, 2)
                if word == "billion":
                    return _Emit(cur + "B", i, 2)
                if word == "trillion":
                    return _Emit(_fmt_scaled(parse_number(cur) * 1000, "B"), i, 2)
                return _Emit(is_k_m_b(cur), i, 1)
            if "/" in cur and cur[0] != "0" and cur[cur.index("/") + 1] != "0":
                return _Emit(cur, i, 1)
            if cur[0] != "0":
                term = is_k_m_b(cur)
                y = 0
                if (
                    not any(c in term.lower() for c in "kmb")
                    and n1 is not None
                    and "/" in n1
                    and n1[0] != "0"
                    # reference quirk: the second char guard indexes with
                    # current.indexOf('/') == -1, i.e. re-checks n1[0]
                    and n1[0] != "0"
                    and is_number(n1.replace("/", ""))
                ):
                    term = f"{term} {n1}"
                    y = 1
                return _Emit(term, i, 1 + y)
            return _Emit(cur, i, 1)
        return None

    if "-" in cur or cur.lower() == "between" or cur in MONTHS:
        # ---- N4: word dash range -----------------------------------------
        if _dash_range_ok(cur):
            term = cur.upper() if cur[0].isupper() else cur.lower()
            return _Emit(term.rstrip("-"), i, 1, to_stem=True)

        # ---- N10: "between N and M" ----------------------------------------
        n1, n2, n3 = (
            tokens[i + 1] if n - (i + 3) > 0 else None,
            tokens[i + 2] if n - (i + 3) > 0 else None,
            tokens[i + 3] if n - (i + 3) > 0 else None,
        )
        if (
            n3 is not None
            and cur.lower() == "between"
            and is_number(n1)
            and is_number(n3)
            and n2.lower() == "and"
        ):
            return _Emit(f"Between {n1} {n2} {n3}", i, 4)

        # ---- N11: "Month N" -> MM-DD or YYYY-MM ------------------------------
        nx = tokens[i + 1] if n - (i + 1) > 0 else None
        if cur in MONTHS and nx is not None and is_number(nx):
            month = MONTHS[cur]
            y = int(parse_number(nx))
            if 0 < y <= 31:
                day_s = f"0{y}" if y < 10 else str(y)
                return _Emit(f"{month:02d}-{day_s}", i, 2)
            return _Emit(f"{y}-{month:02d}", i, 2)
    return None


# --------------------------------------------------------------------------
# Per-document parse: rules + stop words + case folding + importance
# --------------------------------------------------------------------------

IMPORTANT_POSITION_LIMIT = 30


@dataclass
class TermStats:
    tf: int = 0
    positions: list[int] = field(default_factory=list)
    important: bool = False


def parse_doc(
    text: str,
    stop_words: frozenset[str],
    stem: bool = True,
) -> dict[str, TermStats]:
    """Full per-document parse: N1 tokenize, stop-word filter (F1),
    N2-N12 rewrites, N13 case folding with uppercase demotion, N14
    stemming, N15 importance.  Returns the doc-level term map keyed by
    the doc-canonical term (UPPER / lower / rule-built exact case)."""
    tokens = tokenize(text)
    return parse_tokens(tokens, stop_words, stem)


def parse_tokens(
    tokens: list[str],
    stop_words: frozenset[str],
    stem: bool = True,
) -> dict[str, TermStats]:
    terms: dict[str, TermStats] = {}
    n = len(tokens)
    i = 0
    while i < n:
        cur = tokens[i]

        # F1: stop-word filter; the literal lowercase "between" survives
        if cur.lower() in stop_words and cur.strip() != "between":
            i += 1
            continue

        emit = _match_rule(tokens, i)

        if emit is None and cur.strip() == "between":
            i += 1
            continue

        if emit is None or emit.to_stem:
            # plain word (or dash range): stem + case folding
            raw = cur if emit is None else emit.term
            index = i if emit is None else emit.index
            word = porter_stem(raw) if stem else raw
            lower, upper = word.lower(), word.upper()
            if lower in terms:
                key = lower
            elif upper in terms:
                if word[0].isupper():
                    key = upper
                else:
                    # demotion: one lowercase occurrence forces the
                    # doc-level key to lowercase, merging tf/positions
                    old = terms.pop(upper)
                    old.tf += 1
                    old.positions.append(i)
                    terms[lower] = old
                    i += 1
                    continue
            else:
                key = upper if word[0].isupper() else lower
            _add_term(terms, key, index)
            i += 1
        else:
            _add_term(terms, emit.term, emit.index)
            i += emit.consumed
    return terms


def _add_term(terms: dict[str, TermStats], key: str, index: int) -> None:
    st = terms.get(key)
    if st is None:
        terms[key] = TermStats(
            tf=1, positions=[index], important=index < IMPORTANT_POSITION_LIMIT
        )
    else:
        st.tf += 1
        st.positions.append(index)


def load_stop_words(path: str) -> frozenset[str]:
    """One word per line, trimmed (S3)."""
    with open(path, encoding="utf-8") as fh:
        return frozenset(line.strip() for line in fh if line.strip())

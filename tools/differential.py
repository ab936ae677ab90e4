#!/usr/bin/env python3
"""Differential fuzz: reference (Python) vs graft (Scala) on dedup and
chunking. Generates random block corpora / texts, runs the REFERENCE
implementation from /root/reference (read-only import), writes inputs +
expected outputs, then `graft.tools.DifferentialCheck` replays them
through the Scala engine and diffs byte-for-byte.

Usage:
  python3 tools/differential.py gen <dir> [n_cases]   # write cases + expected
  (then) sbt "runMain graft.tools.DifferentialCheck <dir>"
"""
import importlib.util
import json
import os
import random
import sys
import types

# Load the reference modules standalone (stub the tokenizer import).
import re as _re
mod = types.ModuleType("open_ai_key_app.utils.token_util")
# whitespace stub matching the Scala WhitespaceTokenizer EXACTLY (Java
# regex \S = [^ \t\n\x0b\f\r]): tokenizers are injectable test stubs,
# not the system under test — both sides must share one definition or
# chunk-boundary diffs reflect stub skew, not algorithm divergence.
# (python str.split() would differ: it also treats \x85/\u2028 etc.
# as whitespace.)
mod.num_tokens_from_string = lambda s: len(_re.findall(r"[^ \t\n\x0b\x0c\r]+", s))
pkg = types.ModuleType("open_ai_key_app")
pkgu = types.ModuleType("open_ai_key_app.utils")
sys.modules["open_ai_key_app"] = pkg
sys.modules["open_ai_key_app.utils"] = pkgu
sys.modules["open_ai_key_app.utils.token_util"] = mod

def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m

dedup = load("dedup_util",
    "/root/reference/scraper_app/src/scraper_app/utils/dedup_util.py")
chunk = load("chunk_util",
    "/root/reference/data_etl_app/src/data_etl_app/utils/chunk_util.py")
strutil = load("str_util",
    "/root/reference/core/src/core/utils/str_util.py")

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango").split()


TERMINATORS = ["\r", "\x0b", "\x0c", "\x85", "\u2028", "\u2029", "\r\n"]


def rand_line(rnd):
    line = " ".join(rnd.choice(WORDS) for _ in range(rnd.randint(0, 8)))
    # occasionally embed a non-\n line terminator mid-line: Python
    # splitlines() treats these as line breaks, and the Scala engine must
    # agree or chunk offsets / dedup line lists diverge
    if rnd.random() < 0.15 and line:
        pos = rnd.randrange(len(line))
        line = line[:pos] + rnd.choice(TERMINATORS) + line[pos:]
    return line


def make_corpus(rnd):
    n_pages = rnd.randint(0, 12)
    header = "\n".join(rand_line(rnd) for _ in range(rnd.randint(0, 5)))
    footer = "\n".join(rand_line(rnd) for _ in range(rnd.randint(0, 5)))
    use_boiler = rnd.random() < 0.7
    bodies = []
    for i in range(n_pages):
        core = "\n".join(rand_line(rnd) for _ in range(rnd.randint(0, 6)))
        if rnd.random() < 0.25 and bodies:
            bodies.append(bodies[rnd.randrange(len(bodies))])  # exact dup
        elif use_boiler and rnd.random() < 0.9:
            bodies.append(f"{header}\n{core}\n{footer}")
        else:
            bodies.append(core)
    sep = "#" * 50
    parts = []
    for i, b in enumerate(bodies):
        if rnd.random() < 0.1:
            # malformed block: no blank line between URL and body
            parts.append(f"{sep}\nhttps://t.example/p{i}\n{b}\n")
        else:
            parts.append(f"{sep}\nhttps://t.example/p{i}\n\n{b}\n")
    return "".join(parts)


def make_text(rnd):
    return "\n".join(rand_line(rnd) for _ in range(rnd.randint(0, 40)))


def make_llm_response(rnd):
    """Messy JSON-array-ish responses like a model would emit."""
    items = []
    for _ in range(rnd.randint(0, 5)):
        w = " ".join(rnd.choice(WORDS) for _ in range(rnd.randint(1, 3)))
        style = rnd.random()
        if style < 0.25:
            w = f'say "{w}" now'          # interior quotes
        elif style < 0.35:
            w = f"{w}\\\"esc"             # pre-escaped quote
        items.append('"' + w + '"')
    body = "[" + ", ".join(items) + "]"
    deco = rnd.random()
    if deco < 0.3:
        body = f"```json\n{body}\n```"
    elif deco < 0.4:
        body = f"```{body}```"
    elif deco < 0.5:
        body = f"  {body} \n"
    elif deco < 0.55:
        body = body[:-1]                  # truncated array
    elif deco < 0.6:
        body = "not json at all " + body
    return body


def main(outdir, n=200, seed=1234):
    os.makedirs(outdir, exist_ok=True)
    rnd = random.Random(seed)
    cases = []
    for i in range(n):
        corpus = make_corpus(rnd)
        expected = dedup.deduplicate_scraped_content(corpus)
        text = make_text(rnd)
        soft = rnd.choice([3, 5, 8, 20])
        overlap = rnd.choice([0.0, 0.15, 0.25, 0.5])
        maxc = rnd.choice([None, 2, 5, 100])
        chunks = chunk.get_chunks_respecting_line_boundaries_sync(
            text, soft, overlap, maxc)
        resp = make_llm_response(rnd)
        cases.append({
            "id": i,
            "corpus": corpus, "dedup_expected": expected,
            "text": text, "soft": soft, "overlap": overlap,
            "max_chunks": maxc, "chunks_expected": chunks,
            "llm_response": resp,
            "repair_expected": strutil.make_json_array_parse_safe(resp),
        })
    with open(f"{outdir}/cases.json", "w") as f:
        json.dump(cases, f)
    print(f"wrote {n} cases to {outdir}/cases.json")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 200,
         int(sys.argv[3]) if len(sys.argv) > 3 else 1234)

#!/usr/bin/env python3
"""Differential fuzz for the LLM-response PARSERS: runs the REFERENCE
parse functions (AST-extracted from /root/reference so their heavy
module imports never load) on randomized response strings and records
expected outputs for graft.tools.DifferentialCheck to replay against
graft.reconcile.Parsers.

Covered (reference → graft):
  parse_llm_search_response                      → parseSearchResponse
  parse_llm_concept_mapping_result               → parseMappingResponse
  parse_chunk_binary_classification_result_*     → parseBinaryResponse
  parse_business_desc_result_from_gpt_response   → parseBusinessDescResponse
  parse_address_list_from_gpt_response           → parseAddressesResponse
  get_matched_concepts_and_unmatched_keywords    → Mapping.matchAndSplit
  get_mapped_known_concepts_and_unmapped_*       → Mapping.applyMapping
  ConceptReconcileNode.reconcile (pure core)     → Reconcile.reconcileConcepts

The binary/desc/address parsers construct pydantic models, so the
expected outputs bake in pydantic v2 lax-coercion semantics (bool from
"yes"/1, int from "5"/5.0, str NOT from numbers, ...) — the Scala side
must reproduce them (graft.reconcile.PydanticLax).

Usage: python3 tools/differential_parsers.py <dir> [n_cases]
Writes <dir>/parser_cases.json.
"""
import ast
import json
import logging
import random
import sys
import importlib.util

logging.disable(logging.CRITICAL)

REF = "/root/reference"


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


str_util = load_module("str_util", f"{REF}/core/src/core/utils/str_util.py")

from typing import Optional  # noqa: E402
from pydantic import BaseModel  # noqa: E402


def extract(path, names, namespace):
    """exec only the named top-level defs/classes from a module file."""
    tree = ast.parse(open(path).read())
    picked = [n for n in tree.body
              if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
              and n.name in names]
    assert len(picked) == len(names), f"missing defs in {path}: {names}"
    mod = ast.Module(body=picked, type_ignores=[])
    exec(compile(mod, path, "exec"), namespace)
    return [namespace[n] for n in names]


base_ns = {
    "json": json,
    "logging": logging,
    "logger": logging.getLogger("ref"),
    "Optional": Optional,
    "BaseModel": BaseModel,
    "make_json_array_parse_safe": str_util.make_json_array_parse_safe,
    "list": list,
}

(ChunkBinaryClassificationResult,) = extract(
    f"{REF}/core/src/core/models/binary_classification_result.py",
    ["ChunkBinaryClassificationResult"], dict(base_ns))
(Address, BusinessDescriptionResult) = extract(
    f"{REF}/core/src/core/models/db/manufacturer.py",
    ["Address", "BusinessDescriptionResult"], dict(base_ns))

ns = dict(base_ns)
ns["ChunkBinaryClassificationResult"] = ChunkBinaryClassificationResult
ns["Address"] = Address
ns["BusinessDescriptionResult"] = BusinessDescriptionResult

from functools import cached_property  # noqa: E402
from typing_extensions import TypedDict  # noqa: E402
import types as _types  # noqa: E402

concept_ns = dict(base_ns)
concept_ns["cached_property"] = cached_property
concept_ns["URIRef"] = str  # annotation-only in the extracted class
(Concept,) = extract(
    f"{REF}/data_etl_app/src/data_etl_app/models/skos_concept.py",
    ["Concept"], concept_ns)
ns["Concept"] = Concept
ns["TypedDict"] = TypedDict
ns["MfgETLDType"] = str
ns["ConceptTypeEnum"] = _types.SimpleNamespace  # only .name is read (logging)

(match_and_split,) = extract(
    f"{REF}/data_etl_app/src/data_etl_app/services/llm_powered/extraction/extract_concept_service.py",
    ["get_matched_concepts_and_unmatched_keywords"], ns)
(LLMMappingResult, apply_mapping) = extract(
    f"{REF}/data_etl_app/src/data_etl_app/services/llm_powered/map/map_known_to_unknown_service.py",
    ["LLMMappingResult", "get_mapped_known_concepts_and_unmapped_keywords"], ns)

(parse_search,) = extract(
    f"{REF}/data_etl_app/src/data_etl_app/services/llm_powered/search/llm_search_service.py",
    ["parse_llm_search_response"], ns)
(parse_mapping,) = extract(
    f"{REF}/data_etl_app/src/data_etl_app/services/llm_powered/map/map_known_to_unknown_service.py",
    ["parse_llm_concept_mapping_result"], ns)
(parse_binary,) = extract(
    f"{REF}/data_etl_app/src/data_etl_app/services/llm_powered/classification/binary_classifier_service.py",
    ["parse_chunk_binary_classification_result_from_gpt_response"], ns)
(parse_addresses, parse_desc) = extract(
    f"{REF}/data_etl_app/src/data_etl_app/services/llm_powered/extraction/extract_basic_service.py",
    ["parse_address_list_from_gpt_response",
     "parse_business_desc_result_from_gpt_response"], ns)


# ---- randomized response generation ---------------------------------------

WORDS = ("alpha bravo charlie delta echo ISO9001 welding CNC forging "
         "anodizing casting milling").split()


def rnd_scalar(r):
    return r.choice([
        None, True, False,
        r.randint(-5, 99), round(r.uniform(-2, 9), 3), float(r.randint(0, 3)),
        str(r.randint(0, 60)), "5.0", "yes", "no", "TRUE", "off",
        " ".join(r.sample(WORDS, r.randint(1, 3))), "",
    ])


def rnd_str_list(r):
    return [r.choice(WORDS + ["", "it's \"quoted\""]) for _ in range(r.randint(0, 4))]


def wrap(r, payload):
    """Optionally fence/dirty the JSON payload like real LLM output."""
    s = payload
    roll = r.random()
    if roll < 0.25:
        s = f"```json\n{s}\n```"
    elif roll < 0.35:
        s = f"```{s}```"
    elif roll < 0.45:
        s = f"Here is the json you asked for: {s}"
    elif roll < 0.5:
        s = s[: max(1, len(s) - r.randint(1, 3))]  # truncated
    return s


def rnd_search_scalar(r):
    """Collision-free under BOTH Python set() equality (False==0, True==1)
    and the jackson_text projection (5 vs "5"): no bools, no digit
    strings, floats kept non-integral exact binary fractions — so the
    expected set and the Scala set have the same cardinality and the
    harness cannot produce false divergences."""
    return r.choice([
        None, r.randint(10, 99) + 100,  # ints disjoint from float/str pools
        r.choice([0.125, 0.375, 2.625, 7.875]),
        r.choice(WORDS), "",
    ])


def gen_search(r):
    roll = r.random()
    if roll < 0.5:
        payload = json.dumps(rnd_str_list(r))
    elif roll < 0.65:
        payload = json.dumps({"not": "an array"})
    elif roll < 0.8:
        payload = json.dumps([rnd_search_scalar(r) for _ in range(r.randint(1, 3))])
    else:
        payload = r.choice(["", "garbage {{{", "[\"unterminated", "null", "[]"])
    return wrap(r, payload)


def gen_mapping(r):
    roll = r.random()
    if roll < 0.6:
        # realistic: str->str-or-null (unmappable stays null)
        d = {w: r.choice([r.choice(WORDS), None]) for w in r.sample(WORDS, r.randint(0, 4))}
        payload = json.dumps(d)
    elif roll < 0.75:
        payload = json.dumps(rnd_str_list(r))  # array instead of object
    else:
        payload = r.choice(["", "{broken", "null", "{}", "[1,2]"])
    return wrap(r, payload)


def gen_binary(r):
    roll = r.random()
    if roll < 0.7:
        d = {}
        # half the cases use plausible field values so the SUCCESS path
        # (lax coercion producing a model) is exercised, not just raises
        plausible = r.random() < 0.5
        for f, good in (("answer", [True, False, "yes", "no", 1, 0, "TRUE"]),
                        ("confidence", [90, "85", 70.0, 0, "5.0"]),
                        ("reason", ["makes things", "a blog", ""])):
            if r.random() < 0.9:
                d[f] = r.choice(good) if plausible else rnd_scalar(r)
        if r.random() < 0.2:
            d["extra_field"] = rnd_scalar(r)
        payload = json.dumps(d)
    else:
        payload = r.choice(["", "notjson", "[]", "null", '{"answer": true}'])
    return wrap(r, payload)


def gen_desc(r):
    roll = r.random()
    if roll < 0.7:
        d = {}
        plausible = r.random() < 0.5
        for f in ("name", "description"):
            if r.random() < 0.85:
                d[f] = r.choice(["Acme", "About stuff", None, ""]) if plausible else rnd_scalar(r)
        payload = json.dumps(d)
    else:
        payload = r.choice(["", "notjson", "[]", "null", "{}"])
    return wrap(r, payload)


def gen_addresses(r):
    def addr():
        d = {}
        plausible = r.random() < 0.6
        if plausible:  # required strict-str fields usually valid
            d["city"] = r.choice(["Phoenix", "Mesa", "springfield"])
            d["state"] = r.choice(["AZ", "il", "Texas"])
        for f in ("city", "state", "country", "name", "county", "postal_code", "place_id"):
            if r.random() < 0.6:
                d.setdefault(f, r.choice(["Phoenix", "az", "", None, "us"])
                             if plausible else rnd_scalar(r))
        for f in ("address_lines", "phone_numbers", "fax_numbers"):
            if r.random() < 0.4:
                d[f] = r.choice([rnd_str_list(r), rnd_scalar(r)])
        for f in ("latitude", "longitude"):
            if r.random() < 0.4:
                d[f] = rnd_scalar(r)
        return d
    roll = r.random()
    if roll < 0.7:
        payload = json.dumps([r.choice([addr(), rnd_scalar(r)])
                              for _ in range(r.randint(0, 3))])
    elif roll < 0.8:
        payload = json.dumps(addr())  # object, not array
    else:
        payload = r.choice(["", "broken[", "null", "[]"])
    return wrap(r, payload)


def gen_vocab(r):
    """Concepts with UNIQUE labels across the vocabulary (the reference
    builds its label map from a SET of concepts, so a duplicate label's
    winner is nondeterministic there — the repo's ontology loader
    rejects duplicates at load time anyway)."""
    labels = r.sample(WORDS, r.randint(2, 8))
    concepts = []
    while labels:
        take = min(len(labels), r.randint(1, 3))
        name, alts = labels[0], labels[1:take]
        labels = labels[take:]
        concepts.append({"name": name, "altLabels": alts})
    return concepts


def keywords_for(r, concepts):
    pool = [l for c in concepts for l in [c["name"]] + c["altLabels"]]
    pool += ["unknown-" + w for w in r.sample(WORDS, 3)] + ["", "zzz"]
    return [r.choice(pool) for _ in range(r.randint(0, 6))]


def gen_match_split(r):
    concepts = gen_vocab(r)
    return {"concepts": concepts, "results": keywords_for(r, concepts)}


def gen_apply_mapping(r):
    concepts = gen_vocab(r)
    kws = keywords_for(r, concepts)
    labels = [l for c in concepts for l in [c["name"]] + c["altLabels"]]
    mapping = {}
    for _ in range(r.randint(0, 5)):
        mu = r.choice(kws + ["hallucinated-" + r.choice(WORDS)]) if kws else "hallucinated"
        mapping[mu] = r.choice(labels + [None, "", "not-a-label"])
    return {"concepts": concepts, "keywords_to_map": kws, "raw_mapping": mapping}


def gen_reconcile(r):
    """Whole-company concept reconcile: vocabulary + 1-4 chunks of
    (bounds, brute labels, raw search response) + ONE raw mapping
    response — the composition ConceptReconcileNode.reconcile runs
    (concept_reconcile_node.py:88-199) over the same pure functions the
    per-function cases above already pin down."""
    concepts = gen_vocab(r)
    labels = [l for c in concepts for l in [c["name"]] + c["altLabels"]]
    pool = labels + ["bbb", "zzz"]
    chunks = []
    for s in sorted(r.sample(range(0, 50), r.randint(1, 4))):
        chunks.append({
            "chunk_start": s * 100,
            "chunk_end": s * 100 + r.randint(1, 99),
            # unique per chunk: the repo canonicalizes brute to
            # distinct+sorted (SURVEY §7.5 risk 3), the reference keeps
            # the raw list — generating unique lists keeps the compare
            # about reconcile logic, not that documented canonicalization
            "brute": sorted(r.sample(pool, r.randint(0, min(3, len(pool))))),
            "search_response": gen_search(r),
        })
    return {"concepts": concepts, "chunks": chunks,
            "mapping_response": gen_mapping(r)}


def run_reconcile(inp):
    known = to_ref_concepts(inp["concepts"])
    raw = parse_mapping(inp["mapping_response"])  # parse error → reconcile raises
    ct = _types.SimpleNamespace(name="certificates")
    final_results = set()
    unmatched_all = set()
    chunk_stats = {}
    for ch in inp["chunks"]:
        llm = parse_search(ch["search_response"])  # never raises (see "search")
        matched, unmatched = match_and_split(known, llm)
        cm = apply_mapping(
            mfg_etld1="x.example", known_concepts=known,
            keywords_to_map=unmatched, raw_gpt_mapping=raw,
            concept_type=ct, keywords_to_map_are_per_chunk=True)
        results = ({c.name for c in matched}
                   | {c.name for c in cm["known_to_unknowns"]})
        chunk_stats[f'{ch["chunk_start"]}:{ch["chunk_end"]}'] = {
            "results": sorted(results),
            "brute": sorted(ch["brute"]),
            "llm": sorted(jackson_text(x) for x in llm),
            "mapping": {c.name: sorted(jackson_text(x) for x in v)
                        for c, v in cm["known_to_unknowns"].items()},
            "unmapped": sorted(jackson_text(x) for x in cm["unmapped_unknowns"]),
        }
        unmatched_all |= unmatched
        final_results |= results
    g = apply_mapping(mfg_etld1="x.example", known_concepts=known,
                      keywords_to_map=unmatched_all, raw_gpt_mapping=raw,
                      concept_type=ct)
    return {"value": {
        "results": sorted(final_results),
        "mapping": {c.name: sorted(jackson_text(x) for x in v)
                    for c, v in g["known_to_unknowns"].items()},
        "unmapped": sorted(jackson_text(x) for x in g["unmapped_unknowns"]),
        "chunks": chunk_stats}}


def to_ref_concepts(spec):
    return {Concept(name=c["name"], uri="urn:x", altLabels=c["altLabels"], ancestors=[])
            for c in spec}


def run_match_split(inp):
    matched, unmatched = match_and_split(to_ref_concepts(inp["concepts"]),
                                         set(inp["results"]))
    return {"value": {"matched": sorted(c.name for c in matched),
                      "unmatched": sorted(unmatched)}}


def run_apply_mapping(inp):
    out = apply_mapping(
        mfg_etld1="x.example", known_concepts=to_ref_concepts(inp["concepts"]),
        keywords_to_map=set(inp["keywords_to_map"]),
        raw_gpt_mapping=inp["raw_mapping"],
        concept_type=_types.SimpleNamespace(name="certificates"))
    return {"value": {
        "known_to_unknowns": {c.name: sorted(v)
                              for c, v in out["known_to_unknowns"].items()},
        "unmapped": sorted(out["unmapped_unknowns"])}}


# ---- expected-output serialization ----------------------------------------

def jackson_text(x):
    """Project a JSON scalar to Jackson's asText() repr — the search
    differential checks WHICH elements survive parsing, not the repr of
    non-string scalars (LLM keyword arrays are strings in practice;
    generated floats are short decimals where Python repr == Java
    Double.toString)."""
    if x is None:
        return "null"
    if x is True:
        return "true"
    if x is False:
        return "false"
    if isinstance(x, float) and x == int(x):
        return f"{x:.1f}"
    return str(x)


def canon_mapping(d):
    # applyMapping-equivalent form: non-string values can never match a
    # (string) vocabulary label, so they canonicalize to null
    return {k: (v if isinstance(v, str) else None) for k, v in d.items()}


def run(kind, fn, inp):
    try:
        out = fn(inp)
    except Exception:
        return {"raises": True}
    if kind == "search":
        return {"value": sorted(jackson_text(x) for x in out)}
    if kind == "mapping":
        return {"value": canon_mapping(out)}
    if kind == "binary":
        return {"value": {"answer": out.answer, "confidence": out.confidence,
                          "reason": out.reason}}
    if kind == "desc":
        return {"value": {"name": out.name, "description": out.description}}
    if kind == "addresses":
        return {"value": [a.model_dump() for a in out]}
    raise AssertionError(kind)


GENS = {
    "search": (gen_search, parse_search),
    "mapping": (gen_mapping, parse_mapping),
    "binary": (gen_binary, parse_binary),
    "desc": (gen_desc, parse_desc),
    "addresses": (gen_addresses, parse_addresses),
}


def main():
    out_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    r = random.Random(20260812)
    cases = []
    for kind, (gen, fn) in GENS.items():
        for i in range(n):
            inp = gen(r)
            cases.append({"id": f"{kind}-{i}", "kind": kind, "input": inp,
                          "expected": run(kind, fn, inp)})
    # vocabulary match/split + unknown→known mapping + whole-company
    # reconcile composition (structured inputs)
    for kind, gen, runner in [("match_split", gen_match_split, run_match_split),
                              ("apply_mapping", gen_apply_mapping, run_apply_mapping),
                              ("reconcile", gen_reconcile, run_reconcile)]:
        for i in range(n):
            inp = gen(r)
            try:
                expected = runner(inp)
            except Exception:
                expected = {"raises": True}
            cases.append({"id": f"{kind}-{i}", "kind": kind, "input": inp,
                          "expected": expected})
    import os
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/parser_cases.json", "w") as f:
        json.dump(cases, f)
    print(f"wrote {len(cases)} parser cases to {out_dir}/parser_cases.json")


if __name__ == "__main__":
    main()

"""GO / EC annotation ingestion.

Pure-Python parsers replacing the reference's obonet + Biopython.Enzyme
dependencies:

- ``parse_obo`` / ``go_annotations_dataframe`` — GO .obo releases to the
  annotation table consumed by the label-embedding generator (reference
  bin/download_GO_annotations.py:13-101: index = GO id; ``label`` = the def
  string; ``name``; exact/narrow/related/broad synonym lists; is_obsolete).
- ``go_parenthood`` — transitive is_a closure (the parenthood JSON feeding
  the GO-DAG normalizer and the SwissProt dataset builder).
- EC parsing — Expasy enzclass.txt + enzyme.dat to hierarchical label
  descriptions (reference protnote/utils/data.py:359-429 +
  bin/download_EC_annotations.py:11-44).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_SYNONYM_RE = re.compile(r'synonym:\s*"(.*)"\s+(EXACT|NARROW|RELATED|BROAD)\b')
_DEF_RE = re.compile(r'def:\s*"(.*)"\s*(\[.*\])?\s*$')
_OBSOLETE_PREFIX_RE = re.compile(r"^\s*obsolete\.?\s*", re.IGNORECASE)

SYNONYM_KEYS = {
    "EXACT": "synonym_exact",
    "NARROW": "synonym_narrow",
    "RELATED": "synonym_related",
    "BROAD": "synonym_broad",
}


def _obo_unescape(text: str) -> str:
    """Resolve OBO 1.2 escape sequences inside quoted strings."""
    return (
        text.replace('\\"', '"')
        .replace("\\n", "\n")
        .replace("\\t", "\t")
        .replace("\\\\", "\\")
    )


def remove_obsolete_from_string(text: str) -> str:
    """Strip a leading 'OBSOLETE.' marker from a description (reference
    bin/generate_label_embeddings.py strips the token before embedding)."""
    return _OBSOLETE_PREFIX_RE.sub("", text).strip()


def parse_obo(path: str) -> Dict[str, Dict]:
    """Parse an OBO ontology file into ``{term_id: fields}``.

    Fields: ``name``, ``label`` (the def string), ``synonym_exact`` /
    ``synonym_narrow`` / ``synonym_related`` / ``synonym_broad`` (lists),
    ``is_a`` (direct parent ids), ``is_obsolete`` (bool).  Only ``[Term]``
    stanzas are returned (Typedefs skipped).
    """
    terms: Dict[str, Dict] = {}
    current: Optional[Dict] = None
    in_term = False
    with open(path, "r") as fh:
        for raw in fh:
            line = raw.strip()
            if line.startswith("["):
                in_term = line == "[Term]"
                current = None
                continue
            if not in_term or not line:
                continue
            key, _, value = line.partition(":")
            value = value.strip()
            if key == "id":
                current = terms.setdefault(
                    value,
                    {
                        "name": "",
                        "label": "",
                        "synonym_exact": [],
                        "synonym_narrow": [],
                        "synonym_related": [],
                        "synonym_broad": [],
                        "is_a": [],
                        "is_obsolete": False,
                    },
                )
            elif current is None:
                continue
            elif key == "name":
                current["name"] = value
            elif key == "def":
                m = _DEF_RE.match(line)
                if m:
                    # OBO quoted strings escape embedded quotes/backslashes
                    # (\" and \\, present in real go.obo releases); obonet —
                    # the reference's parser — unescapes them, so keeping
                    # the raw backslash would change those labels' text and
                    # therefore their embeddings
                    current["label"] = _obo_unescape(m.group(1))
            elif key == "synonym":
                m = _SYNONYM_RE.match(line)
                if m:
                    current[SYNONYM_KEYS[m.group(2)]].append(
                        _obo_unescape(m.group(1)))
            elif key == "is_a":
                parent = value.split("!")[0].strip()
                if parent:
                    current["is_a"].append(parent)
            elif key == "is_obsolete":
                current["is_obsolete"] = value.lower().startswith("true")
    return terms


def go_annotations_dataframe(obo_path: str):
    """OBO file -> annotation DataFrame (index = GO id; columns name, label,
    synonym_*, is_obsolete) — the table format the reference pickles
    (bin/download_GO_annotations.py:63-101)."""
    import pandas as pd

    terms = parse_obo(obo_path)
    df = pd.DataFrame.from_dict(terms, orient="index")
    df.index.name = None
    return df


def go_parenthood(obo_path: str) -> Dict[str, List[str]]:
    """Transitive is_a closure: term -> sorted list of ALL ancestors
    (excluding the term itself; roots map to [])."""
    terms = parse_obo(obo_path)
    parents = {t: list(v["is_a"]) for t, v in terms.items()}
    closure: Dict[str, List[str]] = {}

    def ancestors(t: str, seen: frozenset) -> set:
        if t in closure:
            return set(closure[t])
        out: set = set()
        for p in parents.get(t, []):
            if p in seen:  # cycle guard
                continue
            out.add(p)
            out |= ancestors(p, seen | {t})
        closure[t] = sorted(out)
        return out

    for t in parents:
        ancestors(t, frozenset())
    return {t: closure[t] for t in parents}


# ---------------------------------------------------------------- EC


def ec_number_to_code(ec_number: str, depth: int = 3) -> Tuple[int, ...]:
    """'1.1.1.4' -> (1, 1, 1); missing levels ('1.-.-.-') are 0
    (reference data.py:359-361)."""
    parts = [int(x) for x in re.findall(r"\d+", ec_number.strip())[:depth]]
    return tuple(parts + [0] * (depth - len(parts)))


_ENZCLASS_LINE_RE = re.compile(r"^(\d+\.\s*(?:\d+|-)\.\s*(?:\d+|-)\.-)")


def get_ec_class_descriptions(enzclass_path: str) -> Dict[Tuple[int, int, int], Dict]:
    """Parse Expasy enzclass.txt (11 header / 5 footer lines) into
    ``{(a,b,c): {raw_label, ec_number, label}}`` where ``label`` is the
    hierarchical description joining each level's text with ', ' and the
    deeper levels lower-cased (reference data.py:364-411)."""
    with open(enzclass_path) as fh:
        lines = fh.readlines()[11:-5]

    classes: Dict[Tuple[int, int, int], Dict] = {}
    for line in lines:
        m = _ENZCLASS_LINE_RE.search(line)
        if not m:
            continue
        ec_number = m.group(1).strip()
        description = line[m.end():].strip()
        code = ec_number_to_code(ec_number)
        classes[code] = {
            "raw_label": description,
            "ec_number": ec_number.replace(" ", ""),
        }

    def deep_label(code: Tuple[int, int, int]) -> str:
        level_code = [0, 0, 0]
        label = ""
        for level in range(3):
            if code[level] > 0:
                level_code[level] = code[level]
                raw = classes[tuple(level_code)]["raw_label"].rstrip(".")
                if level > 0:
                    raw = raw[0].lower() + raw[1:]
                    label += ", " + raw
                else:
                    label += raw
        return label

    for code in classes:
        classes[code]["label"] = deep_label(code)
    return classes


def _parse_enzyme_dat(path: str) -> List[Dict[str, str]]:
    """Minimal Expasy enzyme.dat reader: ID / DE / CA fields per record
    (replaces Biopython.Enzyme.parse)."""
    records: List[Dict[str, str]] = []
    cur: Dict[str, List[str]] = {"ID": [], "DE": [], "CA": []}
    with open(path) as fh:
        for line in fh:
            tag = line[:2]
            body = line[5:].rstrip("\n").strip() if len(line) > 5 else ""
            if tag == "//":
                if cur["ID"]:
                    records.append(
                        {
                            "ID": cur["ID"][0],
                            "DE": " ".join(cur["DE"]).strip(),
                            "CA": " ".join(x for x in cur["CA"] if x).strip(),
                        }
                    )
                cur = {"ID": [], "DE": [], "CA": []}
            elif tag in cur:
                cur[tag].append(body)
    return records


def get_ec_number_description(
    enzyme_dat_path: str, ec_classes: Dict[Tuple[int, int, int], Dict]
) -> List[Dict]:
    """Leaf EC numbers with their catalytic-activity description; empty CA
    falls back to the class label (reference data.py:414-429)."""
    leaves = []
    for rec in _parse_enzyme_dat(enzyme_dat_path):
        code = ec_number_to_code(rec["ID"])
        label = rec["CA"]
        if not label:
            label = ec_classes[code]["label"]
        leaves.append({"ec_number": rec["ID"], "label": label, "parent_code": code})
    return leaves


def ec_annotations_dataframe(enzclass_path: str, enzyme_dat_path: str):
    """Classes + leaves -> annotation table (index 'EC:<number>'; name /
    label / synonym_exact mirroring bin/download_EC_annotations.py:27-44)."""
    import pandas as pd

    classes = get_ec_class_descriptions(enzclass_path)
    leaves = get_ec_number_description(enzyme_dat_path, classes)
    rows = [
        {"ec_number": v["ec_number"], "label": v["label"]} for v in classes.values()
    ] + [{"ec_number": r["ec_number"], "label": r["label"]} for r in leaves]
    df = pd.DataFrame.from_records(rows)
    df["ec_number"] = "EC:" + df["ec_number"]
    df = df.set_index("ec_number")
    df.index.name = None
    df["name"] = df["label"]
    df["synonym_exact"] = df["label"].apply(lambda x: [x])
    return df

"""Synthetic FAERS-shaped fixtures for pipeline tests.

Deterministic (seeded) generator producing the nested report documents the
reference ingests (reactions[], drugs[] with openfda name arrays), a ChEMBL
drug dump, and a blacklist — shaped like the reference's test resources
(``src/test/resources/`` — see FIXTURES.md) but generated, not copied.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

DRUGS = [
    ("CHEMBL25", "aspirin", ["acetylsalicylic acid", "asa"], ["bayer aspirin"]),
    ("CHEMBL112", "paracetamol", ["acetaminophen"], ["tylenol", "panadol"]),
    ("CHEMBL521", "ibuprofen", [], ["advil", "motrin"]),
    ("CHEMBL1201", "omeprazole", ["omeprazol"], ["prilosec"]),
    ("CHEMBL941", "imatinib", [], ["gleevec", "glivec"]),
    ("CHEMBL1771", "warfarin", [], ["coumadin"]),
]

REACTIONS = [
    "headache",
    "nausea",
    "dizziness",
    "rash",
    "fatigue",
    "vomiting",
    "gastrointestinal bleeding",
    "liver injury",
    "drug ineffective",  # blacklisted
    "off label use",  # blacklisted
]

BLACKLIST = ["drug ineffective", "off label use", "product quality issue"]


def write_fixtures(tmpdir: str | Path, n_reports: int = 300, seed: int = 7):
    """Write reports.jsonl, drugs.json(l), blacklist.txt; return their paths."""
    tmpdir = Path(tmpdir)
    rng = random.Random(seed)

    reports_path = tmpdir / "reports.jsonl"
    with reports_path.open("w") as f:
        for i in range(n_reports):
            n_reac = rng.randint(1, 3)
            n_drug = rng.randint(1, 3)
            reactions = rng.sample(REACTIONS, n_reac)
            drugs = []
            for _ in range(n_drug):
                chembl, name, generics, brands = rng.choice(DRUGS)
                use_openfda = rng.random() < 0.8
                drug = {
                    # FAERS encodes apostrophes as '^'; sprinkle some in to
                    # exercise normalize_term parity.
                    "medicinalproduct": name.upper() if rng.random() < 0.5 else name,
                    "drugcharacterization": rng.choice(["1", "1", "1", "2", "3"]),
                }
                if use_openfda:
                    drug["openfda"] = {
                        "generic_name": [g.upper() for g in generics],
                        "brand_name": brands,
                        "substance_name": [name],
                    }
                drugs.append(drug)
            report = {
                "safetyreportid": f"SR{i:06d}",
                "serious": rng.choice(["1", "2"]),
                "receivedate": "20200101",
                "primarysource": {
                    "qualification": rng.choice(["1", "2", "3", "4", "5"])
                },
                "patient": {
                    "reaction": [
                        {"reactionmeddrapt": r.upper() if rng.random() < 0.3 else r}
                        for r in reactions
                    ],
                    "drug": drugs,
                },
            }
            if rng.random() < 0.1:
                report["seriousnessdeath"] = "1"
            f.write(json.dumps(report) + "\n")

    drugs_path = tmpdir / "drugs.jsonl"
    with drugs_path.open("w") as f:
        for chembl, name, generics, brands in DRUGS:
            f.write(
                json.dumps(
                    {
                        "id": chembl,
                        "name": name,
                        "synonyms": generics,
                        "tradeNames": brands,
                    }
                )
                + "\n"
            )

    blacklist_path = tmpdir / "blacklist.txt"
    blacklist_path.write_text("\n".join(BLACKLIST) + "\n")

    return str(reports_path), str(drugs_path), str(blacklist_path)

"""Generate the profile-mode oracle fixture (tests/fixtures/oracle/
profile_mode/) from a reference-binary run:

    .refbuild/src/spacedust clusterdb genome tmpc
    .refbuild/src/spacedust clustersearch genome genome out tmp \
        --filter-self-match --profile-cluster-search

Selects ~50 query genes whose reference profile-hit lists are well under
the 100-result cap (so hit sets restricted to the sampled rep union are
cap-independent), and trims the reference clu/clu_aln/rep_profile DBs to
the union of reps those queries hit.  The committed fixture then pins
search_profile_target + expandaln line-for-line in the default suite
(tests/test_cluster_profile.py)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from spacedust_tpu.db.mmseqs_io import (FlatDB, write_flatdb,
                                        write_flatdb_bytes)

REFRUN = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/refrun")
TMPP = next((REFRUN / "tmpp").iterdir())
OUT = Path(__file__).resolve().parents[1] / "tests/fixtures/oracle/profile_mode"
OUT.mkdir(parents=True, exist_ok=True)

result_clu = FlatDB.open(str(TMPP / "result_clu"))
result = FlatDB.open(str(TMPP / "result"))

# queries with 2..60 hits, every 29th for diversity, max 50
picked = []
for k in result_clu.keys():
    n = len(result_clu.lines(k))
    if 2 <= n <= 60:
        picked.append(k)
picked = picked[:: max(1, len(picked) // 50)][:50]

reps = set()
for k in picked:
    for ln in result_clu.lines(k):
        reps.add(int(ln.split("\t", 1)[0]))

TMPC = next((REFRUN / "tmpc").iterdir())
# membership lives in the clusterdb tmp (cluster_mmseqs: rep -> members);
# genome_clu itself holds the consensus sequences (data/clusterdb.sh)
clu = FlatDB.open(str(TMPC / "cluster_mmseqs"))
aln = FlatDB.open(str(REFRUN / "genome_clu_aln"))
prof = FlatDB.open(str(REFRUN / "genome_clu_rep_profile"))

write_flatdb(str(OUT / "genome_clu"),
             [(k, clu.get(k)) for k in sorted(reps)], dbtype=6)
write_flatdb(str(OUT / "genome_clu_aln"),
             [(k, aln.get(k)) for k in sorted(reps)], dbtype=5)
write_flatdb_bytes(str(OUT / "genome_clu_rep_profile"),
                   [(k, prof.get_bytes(k)) for k in sorted(reps)], dbtype=2)
write_flatdb(str(OUT / "result_clu"),
             [(k, result_clu.get(k)) for k in picked], dbtype=5)
write_flatdb(str(OUT / "result"),
             [(k, result.get(k)) for k in picked], dbtype=5)

# DBReader::getAminoAcidDBSize for profile DBs: dataSize/25 - size
# (lib/mmseqs/src/commons/DBReader.cpp:589-597) — dataSize includes each
# entry's NUL, so the quirk -n + n//25 must be replicated for E-value
# bit-parity in swapresults
data_size = sum(length for _, _, length in prof.index)
profile_res = data_size // 25 - len(prof.index)
meta = {"n_genes": 5898, "n_profiles": len(prof.index),
        "profile_res": profile_res, "queries": picked,
        "n_reps": len(reps)}
(OUT / "meta.json").write_text(json.dumps(meta))
print(json.dumps({"picked": len(picked), "reps": len(reps),
                  "profile_res": profile_res,
                  "fixture_bytes": sum(f.stat().st_size
                                       for f in OUT.iterdir())}))

#!/usr/bin/env python3
"""Regenerate QUERIES.md: registry index of every qNN query with its
implementation site and verification tier. Run from the repo root."""
import re, json

mods = {
 'Relational': 'src/main/scala/graft/queries/Relational.scala',
 'LlmQueries': 'src/main/scala/graft/queries/LlmQueries.scala',
 'Extended': 'src/main/scala/graft/queries/Extended.scala',
 'Pipeline': 'src/main/scala/graft/queries/Pipeline.scala',
 'Curation': 'src/main/scala/graft/queries/Curation.scala',
 'Analytics': 'src/main/scala/graft/queries/Analytics.scala',
 'Advanced': 'src/main/scala/graft/queries/Advanced.scala',
 'TpchTail': 'src/main/scala/graft/queries/TpchTail.scala'}
entries = {}
for mod, path in mods.items():
    src = open(path).read()
    for m in re.finditer(r'"(q\d+_\w+)"\s*->\s*(\w+)', src):
        key, val = m.groups()
        if key.endswith('Sql') or val.endswith('Sql'):
            continue
        dm = re.search(rf'^\s*val {val}: Q', src, re.M)
        line = src[:dm.start()].count('\n') + 1 if dm else ''
        entries.setdefault(key, (mod, path, line, val))
quad = {'q32_dedup_minhash_lsh', 'q56_dedup_clusters', 'q59_corpus_filter',
        'q177_incremental_neardup', 'q178_cc_alternating'}
spec_tier = {'q181_semdedup'}
# sf1 tier: queries hash-matched against DuckDB on the 10x-bench-scale
# SfGen corpus (CORRECTNESS_sf1.json, round 9)
# Missing artifact is legitimate (pre-round-9 checkouts); a MALFORMED one
# must fail loudly — a bare except here silently dropped every sf1 tier
# annotation when the file couldn't parse (ADVICE.md round-9 finding).
try:
    sf1 = {k for k, v in json.load(open('CORRECTNESS_sf1.json'))['queries'].items()
           if v.get('hash_match')}
    print(f'[gen_queries_md] sf1 tier: {len(sf1)} hash-matched queries')
except FileNotFoundError:
    print('[gen_queries_md] WARNING: CORRECTNESS_sf1.json absent — no sf1 tiers')
    sf1 = set()
# sf1 TRUTH tier: the quadratic-oracle family, set-compared at sf1
# against the lifted planted truth (TRUTHCHECK_sf1.json, round 10) —
# same missing-vs-malformed discipline as above
try:
    truth_sf1 = {k for k, v in json.load(open('TRUTHCHECK_sf1.json')).items()
                 if v.get('pass')}
    print(f'[gen_queries_md] sf1-truth tier: {len(truth_sf1)} queries')
except FileNotFoundError:
    print('[gen_queries_md] WARNING: TRUTHCHECK_sf1.json absent — no sf1-truth tiers')
    truth_sf1 = set()
lines = ['# QUERIES — registry index (generated; regenerate with tools/gen_queries_md.py)', '',
         'Every registered query with its implementation site and verification tier.',
         'Tiers: **sf0.01** = DuckDB-oracle hash-match (the driver gate);',
         '**sf0.1** = re-verified at 10× scale (DuckDB, or `TruthCheck` Spark',
         'brute-force for the quadratic-oracle family; **spec@sf0.1** = the',
         'sf0.1-sensitive stages ride other verified queries and a planted',
         'union-find spec — see .claude/skills/verify/SKILL.md);',
         '**sf1** = hash-matched at 100× the driver gate (~6 M lineitem rows,',
         'the SfGen corpus — CORRECTNESS_sf1.json);',
         '**truth@sf1** = quadratic-oracle family set-compared at sf1 against',
         'the complete lifted planted truth (text is copy-invariant under',
         'SfGen, so the sf0.1 brute-force truth lifts exactly —',
         '`graft.TruthCheckSf1`, TRUTHCHECK_sf1.json).', '',
         '| query | impl | verified |', '|---|---|---|']
for key in sorted(entries, key=lambda k: int(k[1:].split('_')[0])):
    mod, path, line, val = entries[key]
    tier = ('sf0.01 + TruthCheck@sf0.1' if key in quad
            else 'sf0.01 + spec@sf0.1' if key in spec_tier else 'sf0.01 + sf0.1')
    if key in sf1:
        tier += ' + sf1'
    if key in truth_sf1:
        tier += ' + truth@sf1'
    lines.append(f'| {key} | `{path}:{line}` | {tier} |')
open('QUERIES.md', 'w').write('\n'.join(lines) + '\n')
print(len(entries), 'queries indexed')

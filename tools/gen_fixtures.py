"""Fixture generators for the graft strsim conformance suite.

1. Pure-python replicas of the reference kernel semantics
   (/root/reference/src/expressions/strsim.rs — semantics only, independent
   re-derivation), validated against all 1,115 extracted reference vectors.
2. Unicode supplement vectors (reference vectors are ASCII-only): combining
   marks, CJK, non-BMP emoji/math letters — exercising the JVM
   surrogate-pair trap. Written to src/test/resources/strsim_unicode_vectors.csv
3. Damerau-Levenshtein + Hamming vectors: DL distances cross-checked against
   DuckDB's damerau_levenshtein (unrestricted, verified ca->abc == 2);
   Hamming per the pinned spec (mismatches over common prefix + |len diff|),
   equal-length cases cross-checked against DuckDB hamming.
   Written to src/test/resources/dl_hamming_vectors.csv

All deterministic (seed=42). No external data.
"""
import csv, random, sys

# ---------- python replicas of the pinned semantics ----------

def levenshtein(a: str, b: str) -> float:
    if a == b:
        return 1.0
    A, B = [ord(c) for c in a], [ord(c) for c in b]  # NOTE: python str is code points already
    # python strings iterate code points natively; use them directly
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0.0
    prev = list(range(m + 1))
    for i in range(n):
        cur = [i + 1] + [0] * m
        for j in range(m):
            cur[j + 1] = min(prev[j] + (0 if a[i] == b[j] else 1),
                             prev[j + 1] + 1, cur[j] + 1)
        prev = cur
    return 1.0 - prev[m] / max(n, m)

def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    n, m = len(a), len(b)
    if n == 1 and m == 1:
        return 1.0 if a == b else 0.0
    bound = max(n, m) // 2 - 1
    flag_a = [False] * max(n, m)
    flag_b = [False] * max(n, m)
    match = 0
    for i in range(min(n, m + bound)):
        lo = 0 if bound > i else i - bound
        hi = min(i + bound, m - 1)
        for j in range(lo, hi + 1):
            if a[i] == b[j] and not flag_b[j]:
                match += 1
                flag_a[i] = True
                flag_b[j] = True
                break
    if match == 0:
        return 0.0
    ia = [i for i, f in enumerate(flag_a) if f]
    jb = [j for j, f in enumerate(flag_b) if f]
    t = sum(1 for i, j in zip(ia, jb) if a[i] != b[j])
    return (match / n + match / m + (match - t // 2) / match) / 3.0

def jaro_winkler(a: str, b: str) -> float:
    j = jaro(a, b)
    if j > 0.7:
        l = 0
        for c, d in list(zip(a, b))[:4]:
            if c == d:
                l += 1
            else:
                break
        return j + l * 0.1 * (1.0 - j)
    return j

def _counts(s):
    d = {}
    for c in s:
        d[c] = d.get(c, 0) + 1
    return d

def jaccard(a: str, b: str) -> float:
    if a == b:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    ca, cb = _counts(a), _counts(b)
    inter = sum(min(ca.get(c, 0), cb.get(c, 0)) for c in set(ca) | set(cb))
    union = sum(max(ca.get(c, 0), cb.get(c, 0)) for c in set(ca) | set(cb))
    return inter / union

def sorensen_dice(a: str, b: str) -> float:
    if a == b:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    ca, cb = _counts(a), _counts(b)
    inter = sum(min(ca.get(c, 0), cb.get(c, 0)) for c in set(ca) | set(cb))
    return 2.0 * inter / (len(a) + len(b))

def damerau_levenshtein_dist(a: str, b: str) -> int:
    """Unrestricted DL (Lowrance-Wagner), matching DuckDB."""
    n, m = len(a), len(b)
    if n == 0: return m
    if m == 0: return n
    inf = n + m
    H = [[0] * (m + 2) for _ in range(n + 2)]
    H[0][0] = inf
    for i in range(n + 1):
        H[i + 1][0] = inf
        H[i + 1][1] = i
    for j in range(m + 1):
        H[0][j + 1] = inf
        H[1][j + 1] = j
    da = {}
    for i in range(1, n + 1):
        db = 0
        for j in range(1, m + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            H[i + 1][j + 1] = min(H[i][j] + cost,
                                  H[i + 1][j] + 1,
                                  H[i][j + 1] + 1,
                                  H[k][l] + (i - k - 1) + 1 + (j - l - 1))
        da[a[i - 1]] = i
    return H[n + 1][m + 1]

def damerau_levenshtein(a: str, b: str) -> float:
    if a == b:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    return 1.0 - damerau_levenshtein_dist(a, b) / max(len(a), len(b))

def hamming(a: str, b: str) -> float:
    if a == b:
        return 1.0
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0.0
    mm = sum(1 for c, d in zip(a, b) if c != d) + abs(n - m)
    return 1.0 - mm / max(n, m)

KERNELS = {'levenshtein': levenshtein, 'jaro': jaro, 'jaro_winkler': jaro_winkler,
           'jaccard': jaccard, 'sorensen_dice': sorensen_dice,
           'damerau_levenshtein': damerau_levenshtein, 'hamming': hamming}

# ---------- 1. validate replicas against reference vectors ----------
bad = 0
with open('/root/repo/src/test/resources/strsim_vectors.csv') as f:
    for row in csv.DictReader(f):
        got = KERNELS[row['kernel']](row['a'], row['b'])
        if abs(got - float(row['expected'])) >= 1e-8:
            print('MISMATCH', row, got)
            bad += 1
assert bad == 0, f'{bad} replica mismatches'
print('replicas match all 1115 reference vectors')

# ---------- 2. unicode supplements ----------
rng = random.Random(42)
E_ACUTE = 'é'            # precomposed
E_COMBINING = 'é'       # e + combining acute (2 code points)
pairs = [
    (E_ACUTE, E_COMBINING), ('caf' + E_ACUTE, 'café'),
    ('caf' + E_ACUTE, 'cafe'), ('你好世界', '你好'),
    ('\U0001F600\U0001F601', '\U0001F600'), ('a\U0001F600b', 'ab'),
    ('\U0001D400\U0001D401', '\U0001D400\U0001D402'),
    ('straße', 'strasse'), ('über', 'uber'),
    ('\U0001F600', '\U0001F601'), ('', '\U0001F600'), ('\U0001F600', ''),
    ('naïve', 'naive'), ('Αθήνα', 'Αθηνα'),
]
alphabet = ['a', 'b', E_ACUTE, '世', '\U0001F600', '\U0001D400', '́', 'z']
for _ in range(60):
    la, lb = rng.randint(0, 8), rng.randint(0, 8)
    pairs.append((''.join(rng.choice(alphabet) for _ in range(la)),
                  ''.join(rng.choice(alphabet) for _ in range(lb))))
with open('/root/repo/src/test/resources/strsim_unicode_vectors.csv', 'w', newline='') as f:
    w = csv.writer(f)
    w.writerow(['kernel', 'a', 'b', 'expected'])
    for a, b in pairs:
        for k, fn in KERNELS.items():
            w.writerow([k, a, b, repr(fn(a, b))])
print('wrote', len(pairs) * len(KERNELS), 'unicode vectors')

# ---------- 3. DL + hamming vectors, cross-checked vs DuckDB ----------
import duckdb
con = duckdb.connect()
surnames = set()
with open('/root/repo/src/test/resources/strsim_vectors.csv') as f:
    for row in csv.DictReader(f):
        surnames.add(row['a']); surnames.add(row['b'])
surnames = sorted(s for s in surnames if s)
dl_pairs = []
for _ in range(300):
    a = rng.choice(surnames)
    b = rng.choice(surnames)
    # inject transpositions / edits to exercise DL's transposition path
    if rng.random() < 0.5 and len(a) > 2:
        i = rng.randint(0, len(a) - 2)
        b = a[:i] + a[i + 1] + a[i] + a[i + 2:]
    dl_pairs.append((a, b))
dl_pairs += [('ca', 'abc'), ('ab', 'ba'), ('abc', 'ca'), ('', ''), ('a', ''), ('', 'a'),
             ('aab', 'ab'), ('abcdef', 'abcfed')]
nbad = 0
rows = []
for a, b in dl_pairs:
    mine = damerau_levenshtein_dist(a, b)
    duck = con.execute('select damerau_levenshtein(?, ?)', [a, b]).fetchone()[0]
    if mine != duck:
        print('DL MISMATCH', repr(a), repr(b), mine, duck); nbad += 1
    rows.append(('damerau_levenshtein', a, b, repr(damerau_levenshtein(a, b))))
    if len(a) == len(b) and len(a) > 0:
        hd = sum(1 for c, d in zip(a, b) if c != d)
        duckh = con.execute('select hamming(?, ?)', [a, b]).fetchone()[0]
        assert hd == duckh, (a, b, hd, duckh)
    rows.append(('hamming', a, b, repr(hamming(a, b))))
assert nbad == 0, f'{nbad} DL mismatches vs duckdb'
with open('/root/repo/src/test/resources/dl_hamming_vectors.csv', 'w', newline='') as f:
    w = csv.writer(f)
    w.writerow(['kernel', 'a', 'b', 'expected'])
    w.writerows(rows)
print('wrote', len(rows), 'DL/hamming vectors (DL verified vs duckdb)')

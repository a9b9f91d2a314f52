"""Extract the 1,115 embedded test vectors from the reference's Rust test
module (/root/reference/src/expressions/strsim.rs:347-1535) into a CSV
resource for the Scala conformance suite. Data-only port (no code)."""
import re, sys

src = open('/root/reference/src/expressions/strsim.rs').read()
rows = []
current = None
fn_re = re.compile(r'fn (\w+)\(')
test_re = re.compile(r'\.test\("((?:[^"\\]|\\.)*)", "((?:[^"\\]|\\.)*)", ([0-9.eE+-]+)\);')
kernel_of = {
    'levenshtein': 'levenshtein', 'jaro_winkler': 'jaro_winkler',
    'jaro': 'jaro', 'jaccard': 'jaccard', 'sorensen_dice': 'sorensen_dice',
}
for line in src.splitlines():
    m = fn_re.search(line)
    if m:
        name = m.group(1)
        current = None
        for prefix in ('jaro_winkler', 'sorensen_dice', 'levenshtein', 'jaccard', 'jaro'):
            if name.startswith(prefix):
                current = kernel_of[prefix]
                break
        continue
    m = test_re.search(line)
    if m and current:
        a, b, exp = m.groups()
        assert '\\' not in a and '\\' not in b and ',' not in a and ',' not in b
        rows.append((current, a, b, exp))

from collections import Counter
c = Counter(r[0] for r in rows)
print(c, 'total', len(rows))
assert len(rows) == 1115, len(rows)
assert c == {'levenshtein': 76, 'jaro': 331, 'jaro_winkler': 526, 'jaccard': 91, 'sorensen_dice': 91}, c
with open('/root/repo/src/test/resources/strsim_vectors.csv', 'w') as f:
    f.write('kernel,a,b,expected\n')
    for r in rows:
        f.write(','.join(r) + '\n')
print('wrote', len(rows), 'vectors')

#!/usr/bin/env python3
"""Generate CPython golden outputs for the PyLite differential test.

Each case is (name, code, method, args-as-JSON). The code runs under
real CPython; the returned value is serialized to JSON and committed as
src/test/resources/pylite_golden.json. PyLiteSpec replays every case on
the PyLite interpreter and asserts value equality — the same
golden-row pattern the repo already uses for uuid5 vs CPython uuid.
"""
import json, sys

CASES = [
    ("floor_div_mod_negatives",
     "def f(a, b):\n  return [a // b, a % b, -a // b, -a % b, a // -b, a % -b]",
     "f", [7, 3]),
    ("true_division", "def f(a, b):\n  return [a / b, a / 2, 1 / 3]", "f", [7, 2]),
    ("power", "def f():\n  return [2 ** 10, 2 ** 3 ** 2, (-2) ** 3, 2 ** -2, 2.0 ** 3]", "f", []),
    ("mixed_arith", "def f():\n  return [1 + 2.5, 3 * 2.0, 7 % 2.5, -7 % 2.5, 7.5 // 2, True + True, True * 5]", "f", []),
    ("comparisons", "def f():\n  return [1 == 1.0, 1 < 2.5, 'a' < 'b', [1,2] < [1,3], [1] < [1,0], 2 >= 2, True == 1]", "f", []),
    ("str_methods",
     "def f(s):\n  return [s.upper(), s.lower(), s.strip(), s.lstrip(), s.rstrip(), s.title(), s.capitalize(), s.replace('l','L'), s.startswith('  he'), s.endswith('o  '), s.find('ll'), s.count('l')]",
     "f", ["  hello  "]),
    ("str_split",
     "def f():\n  return ['a b  c'.split(), '  x y '.split(), 'a,,b'.split(','), 'aXXbXXc'.split('XX'), ''.split(','), '   '.split()]",
     "f", []),
    ("str_join_zfill",
     "def f():\n  return ['-'.join(['a','b','c']), ''.join([]), '42'.zfill(5), '-42'.zfill(5), '12345'.zfill(3), 'ab'.isalpha(), '12'.isdigit(), 'a1'.isdigit()]",
     "f", []),
    ("slicing",
     "def f(s):\n  return [s[1:4], s[:3], s[3:], s[-3:], s[:-2], s[10:20], s[2:2], s[-100:2]]",
     "f", ["hello world"]),
    ("list_slicing", "def f(x):\n  return [x[1:3], x[-2:], x[:1], x[5:]]", "f", [[1, 2, 3, 4]]),
    ("negative_index", "def f(x):\n  return [x[-1], x[-4], 'abc'[-1]]", "f", [[10, 20, 30, 40]]),
    ("list_ops",
     "def f():\n  x = [3, 1, 2]\n  x.append(5)\n  x.extend([0, 9])\n  x.insert(1, 7)\n  p = x.pop()\n  q = x.pop(0)\n  x.sort()\n  y = [1, 2, 2, 3]\n  y.reverse()\n  y.remove(2)\n  return [x, p, q, y, y.index(2), y.count(1), [1,2] + [3], [0] * 3]",
     "f", []),
    ("dict_ops",
     "def f():\n  d = {'a': 1}\n  d['b'] = 2\n  d.update({'c': 3})\n  g = d.get('z', 9)\n  s = d.setdefault('e', 5)\n  s2 = d.setdefault('a', 99)\n  p = d.pop('b')\n  return [d, g, s, s2, p, list(d.keys()), list(d.values()), len(d), 'a' in d, 'zz' not in d]",
     "f", []),
    ("dict_items_order",
     "def f():\n  d = {'z': 1, 'a': 2, 'm': 3}\n  out = []\n  for k, v in d.items():\n    out.append(k + str(v))\n  return out",
     "f", []),
    ("truthiness",
     "def f():\n  vals = [0, 1, 0.0, '', 'x', [], [0], {}, {'a': 1}, None, True, False]\n  return [bool(v) for v in vals]" ,
     "f", []),
    ("and_or_returns",
     "def f():\n  return ['' or 'd', 'x' or 'd', '' and 'd', 'x' and 'd', None or 0, 0 or None, 1 and None]",
     "f", []),
    ("conditional_expr", "def f(n):\n  return ['neg' if n < 0 else 'pos', (n if n > 5 else -n) + 1]", "f", [3]),
    ("range_cases",
     "def f():\n  return [list(range(4)), list(range(2, 5)), list(range(0, 10, 3)), list(range(5, 0, -2)), list(range(0))]",
     "f", []),
    ("builtins_minmaxsum",
     "def f():\n  x = [3, 1, 4, 1, 5]\n  return [min(x), max(x), sum(x), min(2, 7), max(2, 7, 1), sum([]), sum([1.5, 2])]",
     "f", []),
    ("abs_round",
     "def f():\n  return [abs(-5), abs(5.5), abs(-2.5), round(2.5), round(3.5), round(-2.5), round(2.675, 2), round(7)]",
     "f", []),
    ("conversions",
     "def f():\n  return [int('42'), int(' -7 '), int(3.99), int(-3.99), int(True), float('2.5'), float(3), str(42), str(3.0), str(2.5), str(True), str(None), str([1, 'a']), str({'k': 1})]",
     "f", []),
    ("enumerate_zip",
     "def f():\n  a = ['x', 'y']\n  b = [10, 20, 30]\n  return [[list(p) for p in enumerate(a)], [list(p) for p in zip(a, b)]]",
     "f", []),
    ("sorted_fn", "def f():\n  return [sorted([3, 1, 2]), sorted(['b', 'a']), sorted([2.5, 1, 3])]", "f", []),
    ("isinstance_checks",
     "def f():\n  return [isinstance(1, int), isinstance(True, int), isinstance(True, bool), isinstance(1.5, float), isinstance('s', str), isinstance([], list), isinstance({}, dict), isinstance(1, (str, int))]",
     "f", []),
    ("while_break_continue",
     "def f(n):\n  total = 0\n  i = 0\n  while True:\n    i += 1\n    if i > n:\n      break\n    if i % 3 == 0:\n      continue\n    total += i\n  return total",
     "f", [10]),
    ("recursion_fib",
     "def fib(n):\n  if n < 2:\n    return n\n  return fib(n - 1) + fib(n - 2)",
     "fib", [15]),
    ("nested_containers",
     "def f(d):\n  d['new'] = {'deep': [1, {'k': 'v'}]}\n  d['new']['deep'][1]['k2'] = d['a'] + 1\n  return d",
     "f", [{"a": 41}]),
    ("aug_assign_subscript",
     "def f():\n  d = {'n': 10}\n  d['n'] += 5\n  d['n'] *= 2\n  x = [1, 2]\n  x[0] += 9\n  return [d, x]",
     "f", []),
    ("in_operators",
     "def f():\n  return ['ell' in 'hello', 'z' in 'hello', 2 in [1, 2], 5 not in [1, 2], 'a' in {'a': 1}, 1 in {1: 'x'}, True in {1: 'y'}]",
     "f", []),
    ("for_over_string_and_dict",
     "def f():\n  out = []\n  for c in 'abc':\n    out.append(c)\n  for k in {'x': 1, 'y': 2}:\n    out.append(k)\n  return out",
     "f", []),
    ("string_mult_concat", "def f():\n  return ['ab' * 3, 3 * 'c', 'a' + 'b', 'x' * 0, 'y' * -1]", "f", []),
    ("chained_methods", "def f(s):\n  return s.strip().lower().replace(' ', '_').split('_')", "f", ["  Hello Big World  "]),
    ("unary_not", "def f():\n  return [not True, not 0, not '', not [1], -(-5), -2.5]", "f", []),
    ("list_comprehension",
     "def f(xs):\n  return [[x * 2 for x in xs], [x for x in xs if x % 2 == 0], [str(x) for x in xs], [k + '=' + str(v) for k, v in {'a': 1, 'b': 2}.items()]]",
     "f", [[1, 2, 3, 4]]),
    ("comprehension_scope",
     "def f():\n  x = 'outer'\n  y = [x for x in range(3)]\n  return [x, y]",
     "f", []),
    ("comprehension_nested_calls",
     "def f(rows):\n  return [r['v'] for r in rows if r['v'] is not None]",
     "f", [[{"v": 1}, {"v": None}, {"v": 3}]]),
    ("dict_comprehension",
     "def f(d):\n  return [{k: v * 2 for k, v in d.items()}, {k: v for k, v in d.items() if v > 1}, {str(v): k for k, v in d.items()}]",
     "f", [{"a": 1, "b": 2, "c": 3}]),
    ("percent_format",
     "def f():\n  return ['%s=%d' % ('k', 7), '%s' % 'solo', '%05d' % 42, '%-6d|' % 42, '%+d %+d' % (5, -5), '%.2f' % 2.675, '%08.2f' % -3.5, '%x %X %o' % (255, 255, 8), '%r' % 'quoted', '100%% done' % (), '%s' % [1, 2], '%.3s' % 'truncate', '%e' % 12345.678]",
     "f", []),
    ("str_format",
     "def f():\n  return ['{}={}'.format('k', 7), '{1}-{0}'.format('a', 'b'), '{:>6}|'.format('ab'), '{:<6}|'.format('ab'), '{:^6}|'.format('ab'), '{:*^7}|'.format('ab'), '{:05d}'.format(42), '{:+d}'.format(5), '{:.2f}'.format(2.675), '{:x}'.format(255), '{:b}'.format(5), '{{literal}}'.format(), '{:.3}'.format('truncate'), '{:08.2f}'.format(-3.5)]",
     "f", []),
]

out = []
for name, code, method, args in CASES:
    g = {}
    exec(code, g)
    result = g[method](*[json.loads(json.dumps(a)) for a in args])
    out.append({"name": name, "code": code, "method": method,
                "args": args, "expected": result})
with open(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/pylite_golden.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(f"wrote {len(out)} golden cases")

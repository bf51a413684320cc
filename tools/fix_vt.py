import sys
p = sys.argv[1]
s = open(p, 'rb').read()
s = s.replace(b"== '\x0b'", b"== '\\u000B'")
open(p, 'wb').write(s)
raw = open(p, 'rb').read()
print('control bytes:', [(i, b) for i, b in enumerate(raw)
                         if b < 9 or (13 < b < 32)])

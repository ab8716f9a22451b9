"""Hello-world demo (counterpart of apps/hello-world/helloWorld.c:1-8)."""

import edlib_tpu

result = edlib_tpu.align("hello", "world!")
print(f"edit_distance('hello', 'world!') = {result['editDistance']}")

"""Hello-world demo (counterpart of apps/hello-world/helloWorld.c:1-8)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import edlib_tpu

result = edlib_tpu.align("hello", "world!")
print(f"edit_distance('hello', 'world!') = {result['editDistance']}")

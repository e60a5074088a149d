import sys
sys.path.insert(0, "/root/repo")
import runpy
runpy.run_path("/root/repo/bench.py", run_name="__main__")

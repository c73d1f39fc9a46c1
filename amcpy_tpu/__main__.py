from amcpy_tpu.cli import main

# The __main__ guard is load-bearing: subsystems that use
# multiprocessing's spawn context (e.g. the parity harness's reference-
# extractor pool) re-import the parent's __main__ module in every worker.
if __name__ == "__main__":
    main()

from amcpy_tpu.cli import main

main()

from deepsolid_tpu.cli import main

main()

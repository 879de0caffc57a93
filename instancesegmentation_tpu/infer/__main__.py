from instancesegmentation_tpu.infer.cli import main

raise SystemExit(main())

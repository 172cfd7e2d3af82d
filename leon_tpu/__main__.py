from leon_tpu.cli import main

raise SystemExit(main())

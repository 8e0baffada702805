from myraytracer_tpu.cli import main

raise SystemExit(main())

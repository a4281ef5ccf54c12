from wave_tracer_tpu.cli import main

raise SystemExit(main())

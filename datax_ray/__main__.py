from datax_ray.cli import main

raise SystemExit(main())

from omniparser_tpu.serving.http import main

main()

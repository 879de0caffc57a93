from instancesegmentation_tpu.train.loop import main

main()

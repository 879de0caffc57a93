from instancesegmentation_tpu.train.loop import main

if __name__ == "__main__":
    main()

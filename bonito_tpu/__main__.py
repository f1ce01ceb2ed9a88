from bonito_tpu import main

if __name__ == "__main__":
    main()

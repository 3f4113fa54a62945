package com.ibm.mq;

/** OFFLINE COMPILE-CHECK STUB — see {@link MQException} header. */
public class MQPutMessageOptions {
    public int options;
}
